"""Pipeline- and sequence-parallel tests on the virtual 8-device CPU mesh.

Pins the GPipe schedule (`parallel/pipeline.py`) to the sequential
``lax.scan`` tower — forward values AND gradients — and checks that it
composes with data/tensor parallelism and the pretraining step, plus the
Megatron-SP activation-layout constraint being a numerical no-op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.config import TINY_TEST
from tapclip_tpu.models import clip as C
from tapclip_tpu.models import layers
from tapclip_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    make_mesh,
)
from tapclip_tpu.parallel.pipeline import (
    check_pipeline_geometry,
    pipeline_transformer_forward,
)
from tapclip_tpu.parallel.sharding import (
    clip_param_specs,
    replicate,
    shard_batch,
    shard_params,
)
from tapclip_tpu.pretrain import make_pretrain_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _blocks_and_x(rng, L=2, B=8, T=8, W=64):
    blocks = layers.init_blocks(jax.random.PRNGKey(3), L, W)
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    return blocks, x


def test_mesh_pp_axis():
    mesh = make_mesh(dp=2, tp=2, pp=2)
    assert dict(mesh.shape) == {DATA_AXIS: 2, PIPE_AXIS: 2, MODEL_AXIS: 2}
    # pp=1 keeps the legacy 2-axis mesh
    assert PIPE_AXIS not in make_mesh(dp=4, tp=2).shape


def test_param_specs_pp_layout(tiny_params):
    mesh = make_mesh(dp=2, tp=2, pp=2)
    specs = clip_param_specs(tiny_params, mesh)
    vis = specs["visual"]["blocks"]
    assert vis["attn"]["w_qkv"] == jax.sharding.PartitionSpec(
        PIPE_AXIS, None, MODEL_AXIS
    )
    assert vis["ln_1"]["scale"] == jax.sharding.PartitionSpec(PIPE_AXIS)
    # non-block leaves stay replicated
    assert specs["visual"]["proj"] == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pipeline_forward_matches_sequential(rng, n_micro):
    blocks, x = _blocks_and_x(rng)
    mesh = make_mesh(dp=2, tp=2, pp=2)
    ref, _ = jax.jit(
        lambda x, b: layers.transformer_forward(x, b, 4, act="gelu")
    )(x, blocks)

    def pp_fn(x, b):
        y, _ = pipeline_transformer_forward(
            x, b, 4, mesh=mesh, n_microbatches=n_micro, act="gelu"
        )
        return y

    out = jax.jit(pp_fn)(x, blocks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_pipeline_grads_match_sequential(rng):
    blocks, x = _blocks_and_x(rng)
    mesh = make_mesh(dp=2, tp=2, pp=2)

    def loss_ref(b):
        y, _ = layers.transformer_forward(x, b, 4, act="gelu")
        return jnp.sum(y**2)

    def loss_pp(b):
        y, _ = pipeline_transformer_forward(
            x, b, 4, mesh=mesh, n_microbatches=4, act="gelu"
        )
        return jnp.sum(y**2)

    g_ref = jax.jit(jax.grad(loss_ref))(blocks)
    g_pp = jax.jit(jax.grad(loss_pp))(blocks)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        g_ref,
        g_pp,
    )


def test_pipeline_sharded_inputs(rng):
    """Pipeline composes with dp-sharded batch and pp+tp-sharded weights."""
    blocks, x = _blocks_and_x(rng)
    mesh = make_mesh(dp=2, tp=2, pp=2)
    ref, _ = jax.jit(
        lambda x, b: layers.transformer_forward(x, b, 4, act="gelu")
    )(x, blocks)

    from jax.sharding import NamedSharding, PartitionSpec as P

    xd = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    specs = jax.tree.map(lambda a: P(PIPE_AXIS, *([None] * (a.ndim - 1))), blocks)
    bd = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), blocks, specs
    )

    def pp_fn(x, b):
        y, _ = pipeline_transformer_forward(
            x, b, 4, mesh=mesh, n_microbatches=4, act="gelu"
        )
        return y

    out = jax.jit(pp_fn)(xd, bd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_pipeline_pretrain_step_matches_dp_only(rng):
    """A dp×pp×tp pretraining step reproduces the dp-only step's loss."""
    cfg = TINY_TEST
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    B = 16
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )

    # the pretrain step DONATES params/opt_state, and CPU device_put can be
    # zero-copy — never hand the step a tree aliasing `params`
    fresh = lambda: jax.tree.map(jnp.array, params)

    mesh_ref = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    step_ref = make_pretrain_step(cfg, opt, mesh=mesh_ref)
    with mesh_ref:
        p = replicate(fresh(), mesh_ref)
        s = replicate(opt.init(params), mesh_ref)
        b = shard_batch((images, ids), mesh_ref)
        _, _, m_ref = step_ref(p, s, *b)

    mesh_pp = make_mesh(dp=2, tp=2, pp=2)
    step_pp = make_pretrain_step(cfg, opt, mesh=mesh_pp, pp_microbatches=4)
    with mesh_pp:
        p = shard_params(fresh(), mesh_pp)
        s = replicate(opt.init(params), mesh_pp)
        b = shard_batch((images, ids), mesh_pp)
        p, s, m_pp = step_pp(p, s, *b)
        # second step exercises the updated (sharded) params end-to-end
        p, s, m2 = step_pp(p, s, *b)

    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
    assert np.isfinite(float(m2["loss"]))


def test_pipeline_with_seq_parallel_matches_dp_only(rng):
    """SP composes with pp: the constraint is applied INSIDE the
    manual-over-pipe region (auto axes only) and stays a numerical no-op."""
    cfg = TINY_TEST
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    B = 16
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )
    fresh = lambda: jax.tree.map(jnp.array, params)

    mesh_ref = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    step_ref = make_pretrain_step(cfg, opt, mesh=mesh_ref)
    with mesh_ref:
        _, _, m_ref = step_ref(
            replicate(fresh(), mesh_ref),
            replicate(opt.init(params), mesh_ref),
            *shard_batch((images, ids), mesh_ref),
        )

    mesh_pp = make_mesh(dp=2, tp=2, pp=2)
    step_pp = make_pretrain_step(
        cfg, opt, mesh=mesh_pp, pp_microbatches=4, seq_parallel=True
    )
    with mesh_pp:
        _, _, m_pp = step_pp(
            shard_params(fresh(), mesh_pp),
            replicate(opt.init(params), mesh_pp),
            *shard_batch((images, ids), mesh_pp),
        )
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-4
    )


def test_pipeline_quantize_fails_loudly(rng):
    """quantize_tower under pp must raise, never silently un-quantize."""
    from tapclip_tpu.parallel.pipeline import make_pipeline_transformer_fn

    mesh = make_mesh(dp=2, tp=2, pp=2)
    fn = make_pipeline_transformer_fn(mesh, n_microbatches=2)
    blocks = __import__("tapclip_tpu.models.layers", fromlist=["x"]).init_blocks(
        jax.random.PRNGKey(0), 2, 64
    )
    x = jnp.zeros((4, 8, 64), jnp.float32)
    with pytest.raises(NotImplementedError, match="quantization"):
        fn(x, blocks, 4, act="gelu", quantize=True)


def test_seq_parallel_is_numerical_noop(rng):
    cfg = TINY_TEST
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    B = 16
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )
    mesh = make_mesh(dp=4, tp=2)
    losses = {}
    # donation + possible zero-copy device_put: hand each step a fresh tree
    fresh = lambda: jax.tree.map(jnp.array, params)
    for sp in (False, True):
        step = make_pretrain_step(cfg, opt, mesh=mesh, seq_parallel=sp)
        with mesh:
            p = shard_params(fresh(), mesh)
            s = replicate(opt.init(params), mesh)
            b = shard_batch((images, ids), mesh)
            _, _, m = step(p, s, *b)
        losses[sp] = float(m["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_pipeline_geometry_errors():
    with pytest.raises(ValueError, match="not divisible"):
        check_pipeline_geometry(3, 2, batch=8, n_microbatches=2)
    with pytest.raises(ValueError, match="not divisible"):
        check_pipeline_geometry(4, 2, batch=6, n_microbatches=4)
    cfg = TINY_TEST.replace(vision_layers=3)
    mesh = make_mesh(dp=2, tp=2, pp=2)
    with pytest.raises(ValueError, match="not divisible"):
        make_pretrain_step(cfg, optax.adam(1e-3), mesh=mesh)


def test_seq_parallel_requires_tp():
    mesh = make_mesh(dp=8, tp=1)
    with pytest.raises(ValueError, match="model"):
        make_pretrain_step(TINY_TEST, optax.adam(1e-3), mesh=mesh, seq_parallel=True)
