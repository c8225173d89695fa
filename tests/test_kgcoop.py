"""KgCoOp knowledge-guided regularizer (TrainConfig.kg_lambda).

Yao et al. (CVPR 2023): add ``lambda * mean_c(1 - cos(w_c, w_c^zs))`` to the
prompt-tuning loss so the learned class embeddings stay anchored to the
frozen zero-shot classifier.  Pins: lambda=0 is bit-identical to the
reference CE-only step; the penalty is reported, differentiable, and
actually pulls toward the anchor; padding classes are masked out; misuse
fails loudly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


@pytest.fixture()
def batch(tiny_cfg, rng):
    feats = jnp.asarray(rng.standard_normal((8, tiny_cfg.embed_dim)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, len(CLASSES), 8), jnp.int32)
    mask = jnp.ones((8,), bool)
    return feats, labels, mask


def _anchor(model, rng):
    c_max = model.prompt_learner.bank.class_mask.shape[0]
    e = model.clip_cfg.embed_dim
    a = rng.standard_normal((c_max, e)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    return jnp.asarray(a)


def _run(model, batch, *, kg_lambda, kg_feats, steps=5, lr=5e-2):
    opt = make_optimizer(TrainConfig(lr=lr))
    state = init_train_state(model.trainable, opt, ("ctx",))
    step = make_train_step(model.clip_cfg, model.prompt_cfg, opt,
                           kg_lambda=kg_lambda, kg_feats=kg_feats)
    bank = model.prompt_learner.bank
    metrics = None
    for _ in range(steps):
        state, metrics = step(model.clip_params, state, bank, *batch)
    return state, metrics


def test_lambda_zero_is_reference_step(model, batch):
    """kg_lambda=0 must not change the program at all (bit-equal params)."""
    s0, m0 = _run(model, batch, kg_lambda=0.0, kg_feats=None, steps=2)
    s1, m1 = _run(model, batch, kg_lambda=0.0,
                  kg_feats=jnp.zeros((1, 1)), steps=2)  # ignored when 0
    np.testing.assert_array_equal(np.asarray(s0.params["ctx"]),
                                  np.asarray(s1.params["ctx"]))
    assert "loss_kg" not in m0 and "loss_kg" not in m1


def test_penalty_reported_and_loss_increases(model, batch, rng):
    anchor = _anchor(model, rng)
    _, m0 = _run(model, batch, kg_lambda=0.0, kg_feats=None, steps=1)
    _, m1 = _run(model, batch, kg_lambda=2.0, kg_feats=anchor, steps=1)
    assert "loss_kg" in m1 and np.isfinite(float(m1["loss_kg"]))
    # penalty of unit vectors vs an unrelated random anchor is ~1
    assert 0.0 < float(m1["loss_kg"]) < 2.0
    assert float(m1["loss"]) > float(m0["loss"])


def test_anchor_pull(model, batch, rng):
    """Training WITH the anchor must end closer to it than training without."""
    from tapclip_tpu.models.model_wrapper import full_model_forward

    anchor = _anchor(model, rng)

    def mean_cos(state):
        out = full_model_forward(
            model.clip_params, state.params, model.prompt_learner.bank,
            None, None, clip_cfg=model.clip_cfg, prompt_cfg=model.prompt_cfg,
            image_feats=batch[0], return_text_feats=True,
        )
        tf = np.asarray(out["text_feats"], np.float32)
        cm = np.asarray(model.prompt_learner.bank.class_mask)
        return float(((tf * np.asarray(anchor)).sum(-1) * cm).sum() / cm.sum())

    s_free, _ = _run(model, batch, kg_lambda=0.0, kg_feats=None, steps=10)
    s_kg, m_kg = _run(model, batch, kg_lambda=20.0, kg_feats=anchor, steps=10)
    assert mean_cos(s_kg) > mean_cos(s_free)
    assert float(m_kg["loss_kg"]) < 1.0  # moved toward the anchor


def test_missing_anchor_rejected(model):
    opt = make_optimizer(TrainConfig())
    with pytest.raises(ValueError, match="kg_feats"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt, kg_lambda=0.5)


def test_fit_prompt_model_integration(model, tiny_cfg, rng):
    """End-to-end through the trainer: the zero-shot anchor is built from
    the model's own tokenizer/classifier and the loop trains."""
    from tapclip_tpu.trainer import CachedSet, fit_prompt_model

    X = rng.standard_normal((24, tiny_cfg.embed_dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    y = np.asarray(rng.integers(0, len(CLASSES), 24), np.int32)
    fit = fit_prompt_model(
        model, CachedSet(X, y), CachedSet(X, y),
        TrainConfig(lr=1e-2, epochs=2, batch_size=8, kg_lambda=1.0),
        verbose=False,
    )
    assert np.isfinite(fit.best_acc)


def test_trainer_anchor_is_same_geometry(model, tiny_cfg, rng):
    """The trainer's anchor must live in the SAME embedding geometry as the
    tuned features (round-3 advisor finding: a build_zero_shot_classifier
    anchor uses the standard encoder while training uses text_mode=
    'ref_compat', making loss_kg O(1) at template init).  With the
    same-pipeline anchor, loss_kg == 0 at init, so a huge kg_lambda barely
    changes the first-epoch loss."""
    import copy

    from tapclip_tpu.trainer import CachedSet, fit_prompt_model

    X = rng.standard_normal((24, tiny_cfg.embed_dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    y = np.asarray(rng.integers(0, len(CLASSES), 24), np.int32)
    cached = CachedSet(X, y)

    def first_epoch_loss(kg_lambda):
        m = copy.deepcopy(model)
        fit = fit_prompt_model(
            m, cached, cached,
            TrainConfig(lr=1e-5, epochs=1, batch_size=8, seed=0,
                        kg_lambda=kg_lambda),
            verbose=False,
        )
        return fit.loss_history[0]

    l0 = first_epoch_loss(0.0)
    l_kg = first_epoch_loss(200.0)
    # cross-geometry anchor would add ~200 * (1 - cos) = O(100) here
    assert abs(l_kg - l0) < 0.5, (l0, l_kg)


def test_resume_anchor_is_init_state(tiny_cfg, tiny_params, rng):
    """A resumed fit must anchor the kg penalty to the INIT adjustor, not the
    restored mid-training one (round-4 review finding): an anchor that tracks
    the restored params regularizes toward a moving target, so a resumed run
    would diverge from the uninterrupted one.  Needs adjustor_method
    'residual' — the default 'scale' never reads the adjustor MLP params,
    which is why the bug was invisible under the default config."""
    import copy

    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.trainer import CachedSet, fit_prompt_model

    pcfg = PromptConfig(max_classes=8, adjustor_method="residual")
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=pcfg)

    X = rng.standard_normal((16, tiny_cfg.embed_dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    y = np.asarray(rng.integers(0, len(CLASSES), 16), np.int32)
    cached = CachedSet(X, y)

    def first_loss(resume_state):
        m = copy.deepcopy(model)
        fit = fit_prompt_model(
            m, cached, cached,
            TrainConfig(lr=1e-8, epochs=1, batch_size=8, seed=0,
                        kg_lambda=200.0),
            verbose=False,
            resume_state=resume_state,
        )
        return fit.loss_history[0]

    # Perturb ONLY the adjustor in the restored state; ctx stays at init,
    # so the tuned features move while the anchor must stay put.
    pert = {k: v for k, v in model.trainable.items()}
    pert["adjustor"] = jax.tree.map(lambda a: a + 1.0, pert["adjustor"])
    l_plain = first_loss(None)
    l_resumed = first_loss({"trainable": pert, "step": 0})
    # With the anchor frozen at init, the perturbed adjustor's features sit
    # far from it -> a large kg penalty.  A buggy anchor built from the
    # restored adjustor keeps loss_kg == 0 and l_resumed ~ l_plain.
    assert l_resumed > l_plain + 1.0, (l_plain, l_resumed)


def test_image_conditioned_composition(tiny_cfg, tiny_params, tiny_prompt_cfg,
                                       batch, rng):
    """The penalty also applies on the CoCoOp [B, C, E] text-feature path."""
    pcfg = dataclasses.replace(tiny_prompt_cfg, image_conditioned=True)
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=pcfg)
    anchor = _anchor(model, rng)
    opt = make_optimizer(TrainConfig(lr=1e-2))
    state = init_train_state(model.trainable, opt, ("ctx", "meta_net"))
    step = make_train_step(model.clip_cfg, pcfg, opt,
                           trainable_keys=("ctx", "meta_net"),
                           kg_lambda=1.0, kg_feats=anchor)
    state, metrics = step(model.clip_params, state,
                          model.prompt_learner.bank, *batch)
    assert np.isfinite(float(metrics["loss_kg"]))
