"""Fused LN+MLP+residual kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.ops.fused_mlp import (
    _erf_poly,
    _fused_mlp_vjp,
    _xla_composition,
    fused_mlp_block,
)


@pytest.fixture()
def shapes(rng):
    B, T, W, H = 2, 8, 128, 512
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(W), jnp.float32)
    b = jnp.asarray(rng.standard_normal(W), jnp.float32)
    wf = jnp.asarray(rng.standard_normal((W, H)) * 0.05, jnp.float32)
    bf = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((H, W)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32)
    return x, g, b, wf, bf, wp, bp


def test_erf_poly_accuracy():
    x = jnp.linspace(-4, 4, 1001)
    import scipy.special as sp

    # A&S 7.1.26 bound is 1.5e-7 in exact arithmetic; f32 rounding adds a bit.
    np.testing.assert_allclose(
        np.asarray(_erf_poly(x)), sp.erf(np.asarray(x)), atol=1e-6
    )


def test_forward_parity(shapes):
    x, g, b, wf, bf, wp, bp = shapes
    out_k = _fused_mlp_vjp(x, g, b, wf, bf, wp, bp, 1e-5, 8, True)
    out_r = _xla_composition(x, g, b, wf, bf, wp, bp, 1e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), rtol=1e-5, atol=2e-6)


def test_grad_parity(shapes):
    x, g, b, wf, bf, wp, bp = shapes
    gk = jax.grad(lambda a: (_fused_mlp_vjp(a, g, b, wf, bf, wp, bp, 1e-5, 8, True) ** 2).sum())(x)
    gr = jax.grad(lambda a: (_xla_composition(a, g, b, wf, bf, wp, bp, 1e-5) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_grad_parity_all_inputs(shapes):
    """Dedicated Pallas backward vs XLA autodiff on every differentiable
    input (dx, dgamma, dbeta, dw_fc, db_fc, dw_proj, db_proj)."""
    x, g, b, wf, bf, wp, bp = shapes
    names = ("x", "gamma", "beta", "w_fc", "b_fc", "w_proj", "b_proj")

    def loss_k(*a):
        return (_fused_mlp_vjp(*a, 1e-5, 8, True) ** 2).sum()

    def loss_r(*a):
        return (_xla_composition(*a, 1e-5) ** 2).sum()

    argnums = tuple(range(7))
    gk = jax.grad(loss_k, argnums)(x, g, b, wf, bf, wp, bp)
    gr = jax.grad(loss_r, argnums)(x, g, b, wf, bf, wp, bp)
    for name, a, r in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_bwd_multi_row_tile_accumulation(rng):
    """Weight gradients must accumulate correctly across >1 row tiles."""
    B, T, W, H = 4, 8, 128, 256  # R=32, row_tile=8 -> 4 grid steps
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(W), jnp.float32)
    b = jnp.asarray(rng.standard_normal(W), jnp.float32)
    wf = jnp.asarray(rng.standard_normal((W, H)) * 0.05, jnp.float32)
    bf = jnp.zeros(H, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((H, W)) * 0.05, jnp.float32)
    bp = jnp.zeros(W, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)

    _, vjp_k = jax.vjp(lambda *a: _fused_mlp_vjp(*a, 1e-5, 8, True),
                       x, g, b, wf, bf, wp, bp)
    _, vjp_r = jax.vjp(lambda *a: _xla_composition(*a, 1e-5),
                       x, g, b, wf, bf, wp, bp)
    for a, r in zip(vjp_k(ct), vjp_r(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_unaligned_fallback(shapes, rng):
    # W=100 not a lane multiple -> must fall back to the XLA composition.
    x = jnp.asarray(rng.standard_normal((2, 7, 100)), jnp.float32)
    ln = {"scale": jnp.ones(100), "bias": jnp.zeros(100)}
    mlp = {
        "w_fc": jnp.asarray(rng.standard_normal((100, 400)) * 0.05, jnp.float32),
        "b_fc": jnp.zeros(400),
        "w_proj": jnp.asarray(rng.standard_normal((400, 100)) * 0.05, jnp.float32),
        "b_proj": jnp.zeros(100),
    }
    out = fused_mlp_block(x, ln, mlp)
    ref = _xla_composition(x, ln["scale"], ln["bias"], mlp["w_fc"], mlp["b_fc"],
                           mlp["w_proj"], mlp["b_proj"], 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_bf16(shapes):
    x, g, b, wf, bf, wp, bp = shapes
    out_k = _fused_mlp_vjp(x.astype(jnp.bfloat16), g, b, wf, bf, wp, bp, 1e-5, 8, True)
    out_r = _xla_composition(x.astype(jnp.bfloat16), g, b, wf, bf, wp, bp, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32), rtol=5e-2, atol=5e-2
    )
