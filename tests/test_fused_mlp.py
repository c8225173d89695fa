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
