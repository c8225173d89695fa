"""SigLIP sigmoid pretraining loss: hand-computed reference, ring-chunked
global equivalence on the virtual 8-device mesh, and a learning step.

The reference repo has no pretraining at all (it sketches InfoNCE in a
comment, ``/root/reference/models/model_wrapper.py:94-99``); the sigmoid
loss is the beyond-reference option of ``tapclip_tpu.pretrain`` whose
sharded form needs no logit all-gather (Zhai et al. 2023's chunked ring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.parallel.mesh import make_mesh
from tapclip_tpu.parallel.sharding import shard_batch
from tapclip_tpu.pretrain import (
    add_siglip_params,
    make_pretrain_step,
    siglip_loss_global,
    siglip_loss_local,
)


def _np_siglip(img, txt, scale, bias):
    """Straight-from-the-paper numpy reference: pairwise log-sigmoid with
    z=+1 on the diagonal, -1 off it, mean over rows of the row sums."""
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = np.exp(scale) * img @ txt.T + bias
    z = 2.0 * np.eye(len(img)) - 1.0
    # log sigmoid(x) = -log1p(exp(-x)), stably
    ls = -np.logaddexp(0.0, -z * logits)
    return float(-ls.sum() / len(img))


def test_local_matches_numpy(rng):
    img = rng.standard_normal((6, 16)).astype(np.float32)
    txt = rng.standard_normal((6, 16)).astype(np.float32)
    got = siglip_loss_local(
        jnp.asarray(img), jnp.asarray(txt),
        jnp.asarray(1.5, jnp.float32), jnp.asarray(-10.0, jnp.float32),
    )
    np.testing.assert_allclose(float(got), _np_siglip(img, txt, 1.5, -10.0),
                               rtol=1e-5)


def test_local_prefers_alignment(rng):
    feats = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    bias = jnp.asarray(-10.0, jnp.float32)
    aligned = siglip_loss_local(feats, feats, scale, bias)
    shuffled = siglip_loss_local(feats, feats[::-1], scale, bias)
    assert float(aligned) < float(shuffled)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_global_matches_local(rng):
    """The ppermute ring loss == the single-device pairwise loss: every
    (image, text) pair is visited exactly once with the right sign."""
    img = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    scale = jnp.asarray(2.0, jnp.float32)
    bias = jnp.asarray(-10.0, jnp.float32)
    local = siglip_loss_local(img, txt, scale, bias)

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        img_s, txt_s = shard_batch((img, txt), mesh)
        ring = jax.jit(
            lambda a, b, s, c: siglip_loss_global(a, b, s, c, mesh)
        )(img_s, txt_s, scale, bias)
    np.testing.assert_allclose(float(ring), float(local), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_global_grads_match_local(rng):
    img = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    scale = jnp.asarray(1.0, jnp.float32)
    bias = jnp.asarray(-5.0, jnp.float32)
    g_local = jax.grad(
        lambda a, b: siglip_loss_local(a, b, scale, bias), argnums=(0, 1)
    )(img, txt)
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        img_s, txt_s = shard_batch((img, txt), mesh)
        g_ring = jax.jit(jax.grad(
            lambda a, b: siglip_loss_global(a, b, scale, bias, mesh),
            argnums=(0, 1),
        ))(img_s, txt_s)
    for gl, gr in zip(g_local, g_ring):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gl),
                                   rtol=2e-4, atol=1e-6)


def test_add_siglip_params(tiny_cfg):
    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    assert "logit_bias" not in params
    p2 = add_siglip_params(params)
    assert float(p2["logit_bias"]) == -10.0
    # idempotent: an existing bias is preserved
    p3 = add_siglip_params(dict(p2, logit_bias=jnp.asarray(-3.0)))
    assert float(p3["logit_bias"]) == -3.0
    assert "logit_bias" not in params  # input untouched


def test_siglip_step_learns(tiny_cfg, rng):
    cfg = tiny_cfg
    params = add_siglip_params(C.init_clip_params(jax.random.PRNGKey(0), cfg))
    opt = optax.adam(1e-3)
    step = make_pretrain_step(cfg, opt, loss="siglip")
    opt_state = opt.init(params)
    images = jnp.asarray(
        rng.standard_normal((4, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (4, cfg.context_length)), jnp.int32
    )
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, images, ids)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_unknown_loss_rejected(tiny_cfg):
    with pytest.raises(ValueError, match="loss"):
        make_pretrain_step(tiny_cfg, optax.adam(1e-3), loss="nope")
