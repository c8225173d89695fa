"""FSDP / ZeRO sharding tests on the virtual 8-device CPU mesh.

The reference is single-GPU (SURVEY.md §2.2); the rebuild's FSDP is pure
GSPMD: ``shard_params(..., fsdp=True)`` places 1/dp of every big weight on
each data rank, ``shard_opt_state`` does the same for the AdamW moments
(ZeRO), and XLA inserts the just-in-time all-gathers / gradient
reduce-scatters.  These tests pin:

* numerics — the fsdp step is bit-for-bit the same *algorithm* as plain DP
  (losses and final params match to f32 reduction tolerance);
* memory — the param and moment leaves really are 1/dp per rank
  (addressable-shard shapes), and a step does not silently re-replicate
  them;
* composition — fsdp x tp works, and fsdp x pp x tp shards block weights
  three ways at once while matching plain-DP losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.parallel.mesh import DATA_AXIS, make_mesh
from tapclip_tpu.parallel.sharding import (
    replicate,
    shard_batch,
    shard_opt_state,
    shard_params,
)
from tapclip_tpu.pretrain import make_pretrain_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _batch(cfg, rng, B=16):
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )
    return images, ids


def _run(cfg, mesh, fsdp, images, ids, n_steps=2, opt=None):
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    if opt is None:
        opt = optax.adamw(1e-2, weight_decay=0.01)
    step = make_pretrain_step(cfg, opt, mesh=mesh, fsdp=fsdp)
    with mesh:
        params_d = shard_params(params, mesh, fsdp=fsdp)
        opt_state = (
            shard_opt_state(opt.init(params), mesh, fsdp=fsdp)
            if fsdp
            else replicate(opt.init(params), mesh)
        )
        images_d, ids_d = shard_batch((images, ids), mesh)
        losses = []
        for _ in range(n_steps):
            params_d, opt_state, m = step(params_d, opt_state, images_d, ids_d)
            losses.append(float(m["loss"]))
    return params_d, opt_state, losses


def _leaf_by_suffix(tree, suffix):
    found = []

    def visit(path, leaf):
        keys = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        if keys.endswith(suffix):
            found.append(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    assert found, f"no leaf with suffix {suffix}"
    return found[0]


def test_fsdp_matches_plain_dp(tiny_cfg, rng):
    images, ids = _batch(tiny_cfg, rng)
    mesh = make_mesh(dp=8, tp=1)
    # Loss trajectory under AdamW (the production optimizer).
    _, _, losses_dp = _run(tiny_cfg, mesh, False, images, ids)
    _, _, losses_fs = _run(tiny_cfg, mesh, True, images, ids)
    np.testing.assert_allclose(losses_dp, losses_fs, rtol=1e-5)
    # Param parity under SGD: Adam's first-step update is ~lr*sign(grad), so
    # reduction-order noise (reduce-scatter vs all-reduce) on near-zero-grad
    # elements flips whole +-lr quanta — ill-conditioned for a parity check.
    # SGD updates are proportional to the grad, making the comparison pin
    # exactly what fsdp changes: the gradient reduction itself.
    sgd = optax.sgd(1e-2)
    p_dp, _, _ = _run(tiny_cfg, mesh, False, images, ids, opt=sgd)
    p_fs, _, _ = _run(tiny_cfg, mesh, True, images, ids, opt=sgd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        p_dp,
        p_fs,
    )


def test_fsdp_shards_params_and_moments(tiny_cfg, rng):
    images, ids = _batch(tiny_cfg, rng)
    mesh = make_mesh(dp=8, tp=1)
    params_d, opt_state, losses = _run(tiny_cfg, mesh, True, images, ids)
    assert all(np.isfinite(l) for l in losses)

    W = tiny_cfg.vision_width
    # params: w_qkv [L, W, 3W] shards dim-1 over data (W/8 per rank), and a
    # training step must NOT re-replicate it (the with_sharding_constraint
    # in the step pins the layout).
    w_qkv = _leaf_by_suffix(params_d["visual"], "attn/w_qkv")
    assert w_qkv.addressable_shards[0].data.shape[1] == W // 8
    assert DATA_AXIS in tuple(w_qkv.sharding.spec)
    # embeddings: vocab dim over data
    tok = params_d["text"]["token_embedding"]
    assert tok.addressable_shards[0].data.shape[0] == tiny_cfg.vocab_size // 8

    # ZeRO: the AdamW moments are sharded the same way (mu and nu mirror the
    # param paths, so the suffix finds a moment leaf inside the optax state)
    mu_qkv = _leaf_by_suffix(opt_state, "visual/blocks/attn/w_qkv")
    assert mu_qkv.addressable_shards[0].data.shape[1] == W // 8


def test_fsdp_composes_with_tp(tiny_cfg, rng):
    images, ids = _batch(tiny_cfg, rng)
    mesh_ref = make_mesh(dp=8, tp=1)
    _, _, losses_ref = _run(tiny_cfg, mesh_ref, False, images, ids)
    mesh = make_mesh(dp=4, tp=2)
    params_d, opt_state, losses = _run(tiny_cfg, mesh, True, images, ids)
    np.testing.assert_allclose(losses_ref, losses, rtol=1e-5)
    W = tiny_cfg.vision_width
    w_qkv = _leaf_by_suffix(params_d["visual"], "attn/w_qkv")
    # dim-1 over data (W/4), dim-2 over model (3W/2)
    assert w_qkv.addressable_shards[0].data.shape[1:] == (W // 4, 3 * W // 2)


def test_fsdp_composes_with_pipeline(tiny_cfg, rng):
    """dp x pp x fsdp: ZeRO sharding under the GPipe schedule.

    Block weights shard three ways at once under dp x pp x tp
    (``w_qkv [L, W, 3W] -> P("pipe", "data", "model")``); the loss
    trajectory must match plain DP (the pipeline is numerics-preserving —
    test_pipeline.py — and FSDP is layout-only).  The cost model (weight
    all-gather per GPipe tick) is documented in parallel/sharding.py.
    """
    images, ids = _batch(tiny_cfg, rng)
    mesh_ref = make_mesh(dp=8, tp=1)
    _, _, losses_ref = _run(tiny_cfg, mesh_ref, False, images, ids)

    mesh = make_mesh(dp=2, pp=2, tp=2)
    params_d, opt_state, losses = _run(tiny_cfg, mesh, True, images, ids)
    np.testing.assert_allclose(losses_ref, losses, rtol=1e-5)

    W = tiny_cfg.vision_width
    L = tiny_cfg.vision_layers
    w_qkv = _leaf_by_suffix(params_d["visual"], "attn/w_qkv")
    # [L, W, 3W]: layers over pipe (L/2), dim-1 over data (W/2),
    # dim-2 over model (3W/2) — and the step must not re-replicate any axis.
    assert w_qkv.addressable_shards[0].data.shape == (L // 2, W // 2, 3 * W // 2)
    # ZeRO: moments mirror the three-way layout.
    mu_qkv = _leaf_by_suffix(opt_state, "visual/blocks/attn/w_qkv")
    assert mu_qkv.addressable_shards[0].data.shape == (L // 2, W // 2, 3 * W // 2)
