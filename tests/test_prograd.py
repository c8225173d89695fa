"""ProGrad prompt-aligned gradient (TrainConfig.prograd_lambda).

Zhu et al. (ICCV 2023): per step, compute the gradient of
KL(zero-shot preds || tuned preds) against the frozen zero-shot classifier
and, when it conflicts with the task gradient, subtract the task gradient's
component along it — the update never increases the KL to the zero-shot
predictions.  Pins: the projection math (orthogonal at lambda=1, no-op
without conflict, noise-guarded near zero); lambda=0 is the cached
reference step; at template init (tuned == zero-shot, KL gradient exactly
the noise case) the prograd step equals the CE step; end-to-end training
through the trainer still learns; misuse fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.parallel.train_step import (
    _prograd_project,
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


def _own_anchor(model):
    """The model's own zero-shot features — what the trainer builds."""
    from tapclip_tpu.models.model_wrapper import text_features_with_attribution

    bank = model.prompt_learner.bank
    return text_features_with_attribution(
        model.clip_params, bank.ctx, bank, model.clip_cfg, model.prompt_cfg,
        model.trainable["adjustor"],
    )[0]


def _run(model, batch, *, prograd_lambda, kg_feats, steps=5, lr=5e-2):
    opt = make_optimizer(TrainConfig(lr=lr))
    state = init_train_state(model.trainable, opt, ("ctx",))
    step = make_train_step(model.clip_cfg, model.prompt_cfg, opt,
                           prograd_lambda=prograd_lambda, kg_feats=kg_feats,
                           anchor_scale=float(model.trainable["logit_scale"]))
    bank = model.prompt_learner.bank
    metrics = None
    for _ in range(steps):
        state, metrics = step(model.clip_params, state, bank, *batch)
    return state, metrics


def test_projection_math(rng):
    g_d = {"a": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
           "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32)}

    # Conflict: g_g = -g_d + orthogonal noise -> dot < 0; at lambda=1 the
    # projected gradient must be exactly orthogonal to g_g.
    g_g = jax.tree.map(lambda x: -x + 0.1, g_d)
    out, conflict = _prograd_project(g_d, g_g, 1.0)
    from jax.flatten_util import ravel_pytree

    fo, _ = ravel_pytree(out)
    fg, _ = ravel_pytree(g_g)
    assert float(conflict) == 1.0
    assert abs(float(jnp.vdot(fo, fg))) < 1e-4 * float(jnp.linalg.norm(fg))

    # No conflict (dot > 0): unchanged.
    out2, c2 = _prograd_project(g_d, jax.tree.map(lambda x: 2.0 * x, g_d), 1.0)
    assert float(c2) == 0.0
    for a, b in zip(jax.tree.leaves(out2), jax.tree.leaves(g_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Noise guard: a vanishing g_g must not delete a random component of
    # the task gradient (|g_g|^2 below the relative threshold -> no-op).
    tiny = jax.tree.map(lambda x: -1e-9 * x + 1e-10, g_d)
    out3, c3 = _prograd_project(g_d, tiny, 1.0)
    assert float(c3) == 0.0
    for a, b in zip(jax.tree.leaves(out3), jax.tree.leaves(g_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lambda_zero_is_reference_step(model, batch):
    s0, m0 = _run(model, batch, prograd_lambda=0.0, kg_feats=None, steps=2)
    assert "prograd_conflict" not in m0
    s1, m1 = _run(model, batch, prograd_lambda=0.0,
                  kg_feats=jnp.zeros((1, 1)), steps=2)  # ignored when 0
    np.testing.assert_array_equal(np.asarray(s0.params["ctx"]),
                                  np.asarray(s1.params["ctx"]))


def test_init_step_matches_ce_step(model, batch):
    """At template init the tuned predictions ARE the zero-shot predictions
    (same features, same scale), so the KL gradient is float noise and the
    guard must leave the CE step untouched."""
    anchor = _own_anchor(model)
    s_ce, _ = _run(model, batch, prograd_lambda=0.0, kg_feats=None, steps=1)
    s_pg, m = _run(model, batch, prograd_lambda=1.0, kg_feats=anchor, steps=1)
    assert float(m["loss_prograd_kl"]) < 1e-5
    assert float(m["prograd_conflict"]) == 0.0
    np.testing.assert_allclose(np.asarray(s_pg.params["ctx"]),
                               np.asarray(s_ce.params["ctx"]),
                               rtol=1e-5, atol=1e-7)


def test_prograd_limits_drift_from_zero_shot(model, batch):
    """Trained WITH prograd, the tuned predictions stay closer (in KL) to
    the zero-shot predictions than unconstrained training — the method's
    defining property."""
    anchor = _own_anchor(model)

    def kl_to_zs(state):
        from tapclip_tpu.models import clip as clip_model
        from tapclip_tpu.models.model_wrapper import full_model_forward

        out = full_model_forward(
            model.clip_params, state.params, model.prompt_learner.bank,
            None, None, clip_cfg=model.clip_cfg, prompt_cfg=model.prompt_cfg,
            image_feats=batch[0],
        )
        img = clip_model.l2_normalize(batch[0]).astype(jnp.float32)
        scale = jnp.exp(state.params["logit_scale"]).astype(jnp.float32)
        zs = scale * img @ jnp.asarray(anchor, jnp.float32).T
        zs = jnp.where(model.prompt_learner.bank.class_mask[None, :], zs,
                       jnp.finfo(jnp.float32).min)
        p_zs = jax.nn.softmax(zs, -1)
        kl = (p_zs * (jax.nn.log_softmax(zs, -1)
                      - jax.nn.log_softmax(out["logits"], -1))).sum(-1)
        return float(kl.mean())

    s_free, _ = _run(model, batch, prograd_lambda=0.0, kg_feats=None,
                     steps=20, lr=1e-1)
    s_pg, m = _run(model, batch, prograd_lambda=1.0, kg_feats=anchor,
                   steps=20, lr=1e-1)
    assert kl_to_zs(s_pg) < kl_to_zs(s_free)
    assert np.isfinite(float(m["loss_prograd_kl"]))


def test_misuse_rejected(model):
    opt = make_optimizer(TrainConfig())
    with pytest.raises(ValueError, match="kg_feats"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt,
                        prograd_lambda=1.0)
    with pytest.raises(ValueError, match="cached-feature"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt,
                        prograd_lambda=1.0, kg_feats=jnp.zeros((8, 16)),
                        use_image_feats=False, anchor_scale=4.6)
    # The zero-shot temperature must be pinned at build time — the live
    # logit_scale would let the 'frozen' distribution drift when trained.
    with pytest.raises(ValueError, match="anchor_scale"):
        make_train_step(model.clip_cfg, model.prompt_cfg, opt,
                        prograd_lambda=1.0, kg_feats=jnp.zeros((8, 16)))


def test_fit_prompt_model_integration(model, tiny_cfg, rng):
    """End-to-end through the trainer: anchor built internally, loop
    trains, and a separable task still reaches high accuracy under the
    projection."""
    from tapclip_tpu.trainer import CachedSet, fit_prompt_model

    # Class-separable unit features: prograd must not prevent learning.
    protos = rng.standard_normal((len(CLASSES), tiny_cfg.embed_dim))
    y = np.asarray(rng.integers(0, len(CLASSES), 48), np.int32)
    X = (protos[y] + 0.05 * rng.standard_normal((48, tiny_cfg.embed_dim))
         ).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    fit = fit_prompt_model(
        model, CachedSet(X, y), CachedSet(X, y),
        TrainConfig(lr=5e-2, epochs=8, batch_size=16, prograd_lambda=1.0),
        verbose=False,
    )
    assert fit.best_acc >= 90.0, fit.best_acc
    assert fit.loss_history[-1] < fit.loss_history[0]
