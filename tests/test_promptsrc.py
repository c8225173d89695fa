"""PromptSRC self-regularization (scl_lambda + Gaussian prompt aggregation).

Khattak et al. (ICCV 2023).  Pins: the scl logit-distillation term is zero
at template init (tuned == zero-shot) and reported in metrics; training
with it stays closer in KL to the zero-shot predictions; Gaussian weights
are normalized and shaped as documented; fit_promptsrc aggregates the
per-epoch prompts via the trainer's checkpoint hook, evaluates both
candidates, and leaves the model at the winner; misuse fails loudly.
"""

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
from tapclip_tpu.promptsrc import fit_promptsrc, gaussian_weights

CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


def _own_anchor(model):
    from tapclip_tpu.models.model_wrapper import text_features_with_attribution

    bank = model.prompt_learner.bank
    return text_features_with_attribution(
        model.clip_params, bank.ctx, bank, model.clip_cfg, model.prompt_cfg,
        model.trainable["adjustor"],
    )[0]


def test_gaussian_weights():
    w = gaussian_weights(10)
    assert w.shape == (10,) and np.isclose(w.sum(), 1.0)
    assert np.argmax(w) == 5  # mu = 0.6 * 10 -> epoch 6 (index 5)
    w_late = gaussian_weights(10, mu=10.0, sigma=1.0)
    assert np.argmax(w_late) == 9
    assert gaussian_weights(1)[0] == 1.0


def test_scl_term_zero_at_init_and_reported(model, tiny_cfg, rng):
    anchor = _own_anchor(model)
    feats = jnp.asarray(rng.standard_normal((8, tiny_cfg.embed_dim)),
                        jnp.float32)
    labels = jnp.asarray(rng.integers(0, len(CLASSES), 8), jnp.int32)
    mask = jnp.ones((8,), bool)
    opt = make_optimizer(TrainConfig())
    state = init_train_state(model.trainable, opt, ("ctx",))
    step = make_train_step(
        model.clip_cfg, model.prompt_cfg, opt, scl_lambda=2.0,
        kg_feats=anchor, anchor_scale=float(model.trainable["logit_scale"]),
    )
    _, m = step(model.clip_params, state, model.prompt_learner.bank,
                feats, labels, mask)
    assert "loss_scl" in m
    # tuned == zero-shot at template init -> the distillation term is ~0
    assert abs(float(m["loss_scl"])) < 1e-5


def test_scl_misuse_rejected(model):
    opt = make_optimizer(TrainConfig())
    with pytest.raises(ValueError, match="kg_feats"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt, scl_lambda=1.0)
    with pytest.raises(ValueError, match="anchor_scale"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt, scl_lambda=1.0,
                        kg_feats=jnp.zeros((8, 16)))


def test_fit_promptsrc_end_to_end(model, tiny_cfg, rng):
    """Separable task: the recipe trains, GPA aggregates over every epoch
    run, both candidates are evaluated, and the model lands on the winner."""
    from tapclip_tpu.trainer import CachedSet, evaluate_cached

    protos = rng.standard_normal((len(CLASSES), tiny_cfg.embed_dim))
    y = np.asarray(rng.integers(0, len(CLASSES), 48), np.int32)
    X = (protos[y] + 0.05 * rng.standard_normal((48, tiny_cfg.embed_dim))
         ).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    cached = CachedSet(X, y)
    res = fit_promptsrc(
        model, cached, cached,
        TrainConfig(lr=5e-2, epochs=8, batch_size=16,
                    kg_lambda=1.0, scl_lambda=1.0),
        verbose=False,
    )
    assert max(res.gpa_acc, res.fit.best_acc) >= 90.0
    assert res.gpa_trainable["ctx"].shape == res.fit.best_trainable["ctx"].shape
    # the GPA context is a genuine trajectory average, not the final point
    assert not np.array_equal(np.asarray(res.gpa_trainable["ctx"]),
                              np.asarray(res.fit.final_state.params["ctx"]))
    # the model was left at the winning candidate
    live_acc, _ = evaluate_cached(model, cached)
    assert live_acc == pytest.approx(max(res.gpa_acc, res.fit.best_acc),
                                     abs=1e-6)


def test_fit_promptsrc_rejects_custom_checkpointing(model, tiny_cfg, rng):
    from tapclip_tpu.trainer import CachedSet

    X = rng.standard_normal((8, tiny_cfg.embed_dim)).astype(np.float32)
    y = np.asarray(rng.integers(0, len(CLASSES), 8), np.int32)
    with pytest.raises(ValueError, match="checkpoint_cb"):
        fit_promptsrc(model, CachedSet(X, y), CachedSet(X, y),
                      TrainConfig(epochs=1), checkpoint_cb=lambda *a: None)


def test_fit_promptsrc_requires_val_set(model, rng):
    """GPA-vs-best winner selection needs validation accuracy; a None
    val_loader must be rejected up front with a clear message (previously it
    crashed deep inside cache_features(model, None))."""
    from tapclip_tpu.trainer import CachedSet

    X = rng.standard_normal((8, model.clip_cfg.embed_dim)).astype(np.float32)
    y = np.asarray(rng.integers(0, len(CLASSES), 8), np.int32)
    with pytest.raises(ValueError, match="validation set"):
        fit_promptsrc(model, CachedSet(X, y), None, TrainConfig(epochs=1))


def test_anchor_templates_require_template_init(tiny_cfg, tiny_params):
    """With use_init_prompt=False the context is a random draw; a fresh
    per-template anchor learner would draw a DIFFERENT random context than
    the live model, silently violating the model's-own-zero-shot-features
    property — rejected up front."""
    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.trainer import _multi_template_anchor

    model = FullModel(
        list(CLASSES), tiny_params, tiny_cfg,
        prompt_cfg=PromptConfig(use_init_prompt=False),
    )
    with pytest.raises(ValueError, match="use_init_prompt"):
        _multi_template_anchor(model, ("a photo of a {}",), None, None)


TEMPLATES = ("a photo of a {}", "a blurry photo of a {}",
             "a sketch of a {}")


def test_multi_template_anchor_geometry(model):
    """Textual diversity: the ensembled anchor is row-normalized, padded to
    the bank width, reduces to the single-template anchor for a 1-list,
    and genuinely differs from it for a multi-template list."""
    from tapclip_tpu.models.model_wrapper import (
        text_features_with_attribution,
    )
    from tapclip_tpu.trainer import _multi_template_anchor

    def anchor_fn(cp, ctx, bank, adj):
        return text_features_with_attribution(
            cp, ctx, bank, model.clip_cfg, model.prompt_cfg, adj
        )[0]

    adj = model.trainable["adjustor"]
    single = np.asarray(_own_anchor(model))
    C_max = model.prompt_learner.bank.ctx.shape[0]

    one = np.asarray(_multi_template_anchor(
        model, (model.prompt_cfg.template,), adj, anchor_fn))
    assert one.shape == (C_max, single.shape[-1])
    np.testing.assert_allclose(one[: len(CLASSES)], single[: len(CLASSES)],
                               rtol=1e-5, atol=1e-6)

    multi = np.asarray(_multi_template_anchor(model, TEMPLATES, adj,
                                              anchor_fn))
    norms = np.linalg.norm(multi[: len(CLASSES)], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert np.linalg.norm(multi[: len(CLASSES)] - single[: len(CLASSES)]) > 1e-3
    # padding rows stay zero (class-masked out of the penalty in the step)
    assert np.all(multi[len(CLASSES):] == 0.0)


def test_fit_with_anchor_templates(model, tiny_cfg, rng):
    """TrainConfig.anchor_templates feeds the ensembled anchor through the
    whole fit: loss_kg is nonzero at the template init (the tuned start is
    template[0] only) and the separable task still trains."""
    from tapclip_tpu.trainer import CachedSet, fit_prompt_model

    protos = rng.standard_normal((len(CLASSES), tiny_cfg.embed_dim))
    y = np.asarray(rng.integers(0, len(CLASSES), 48), np.int32)
    X = (protos[y] + 0.05 * rng.standard_normal((48, tiny_cfg.embed_dim))
         ).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    cached = CachedSet(X, y)
    fit = fit_prompt_model(
        model, cached, cached,
        TrainConfig(lr=5e-2, epochs=8, batch_size=16, kg_lambda=1.0,
                    scl_lambda=0.5, anchor_templates=TEMPLATES),
        verbose=False,
    )
    assert fit.best_acc >= 90.0

    # Direct pin of the nonzero-at-init property with the SAME anchor.
    from tapclip_tpu.models.model_wrapper import (
        text_features_with_attribution,
    )
    from tapclip_tpu.trainer import _multi_template_anchor

    model2_trainable_ctx = model.prompt_learner.bank.ctx  # template init
    anchor = _multi_template_anchor(
        model, TEMPLATES, model.trainable["adjustor"],
        lambda cp, ctx, bank, adj: text_features_with_attribution(
            cp, ctx, bank, model.clip_cfg, model.prompt_cfg, adj)[0],
    )
    opt = make_optimizer(TrainConfig())
    trainable0 = dict(model.trainable)
    trainable0["ctx"] = model2_trainable_ctx
    state = init_train_state(trainable0, opt, ("ctx",))
    step = make_train_step(
        model.clip_cfg, model.prompt_cfg, opt, kg_lambda=1.0,
        kg_feats=anchor,
    )
    feats = jnp.asarray(X[:8])
    _, m = step(model.clip_params, state, model.prompt_learner.bank, feats,
                jnp.asarray(y[:8]), jnp.ones((8,), bool))
    assert float(m["loss_kg"]) > 1e-4  # ensembled anchor != template-0 init


def test_gpa_aggregates_meta_net_under_cocoop(tiny_cfg, tiny_params,
                                              tiny_prompt_cfg, rng):
    """CoCoOp x GPA: every trained leaf is Gaussian-averaged — the returned
    trainable never pairs a GPA ctx with a best-epoch meta-net."""
    import dataclasses

    from tapclip_tpu.trainer import CachedSet, evaluate_cached

    pcfg = dataclasses.replace(tiny_prompt_cfg, image_conditioned=True)
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=pcfg)
    protos = rng.standard_normal((len(CLASSES), tiny_cfg.embed_dim))
    y = np.asarray(rng.integers(0, len(CLASSES), 32), np.int32)
    X = (protos[y] + 0.05 * rng.standard_normal((32, tiny_cfg.embed_dim))
         ).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    cached = CachedSet(X, y)
    res = fit_promptsrc(
        model, cached, cached,
        TrainConfig(lr=5e-2, epochs=4, batch_size=16),
        verbose=False,
    )
    assert "meta_net" in res.gpa_trainable
    # the GPA meta-net is a trajectory average, not the final/best point
    final_mn = jax.tree.leaves(res.fit.final_state.params["meta_net"])
    gpa_mn = jax.tree.leaves(res.gpa_trainable["meta_net"])
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(gpa_mn, final_mn)
    )
    live_acc, _ = evaluate_cached(model, cached)
    assert live_acc == pytest.approx(max(res.gpa_acc, res.fit.best_acc),
                                     abs=1e-6)
