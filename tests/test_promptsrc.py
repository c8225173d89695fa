"""PromptSRC self-regularization (scl_lambda + Gaussian prompt aggregation).

Khattak et al. (ICCV 2023).  Pins: the scl logit-distillation term is zero
at template init (tuned == zero-shot) and reported in metrics; training
with it stays closer in KL to the zero-shot predictions; Gaussian weights
are normalized and shaped as documented; fit_promptsrc aggregates the
per-epoch prompts via the trainer's checkpoint hook, evaluates both
candidates, and leaves the model at the winner; misuse fails loudly.
"""

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
