"""Blockwise (online-softmax) flash-attention kernel tests.

Long-sequence path: KV chunks with running max/denominator, aux column
reconstructed from the final (m, l) — memory O(T·Dh) instead of O(T²)
(SURVEY.md §5 long-context note: ViT-L/14 @ 197 patches and batch-1k
attribution stay memory-safe; this path extends to multi-k tokens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.flash_attention import _pallas_attention_blocked


def _qkv(rng, B, H, T, Dh):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("T,causal", [(100, False), (700, True), (1030, False)])
def test_blocked_matches_reference(rng, T, causal):
    q, k, v = _qkv(rng, 2, 2, T, 16)
    valid = jnp.full((2,), T, jnp.int32)
    eot = jnp.full((2,), T - 1, jnp.int32)
    out_b, aux_b = _pallas_attention_blocked(
        q, k, v, valid, eot, causal=causal, with_aux=True, interpret=True
    )
    out_r, aux_r = attention_reference(
        q, k, v, causal=causal, kv_valid_len=valid, attn_to_idx=eot
    )
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_b), np.asarray(aux_r), rtol=1e-4, atol=1e-6)


def test_blocked_variable_lengths(rng):
    q, k, v = _qkv(rng, 3, 2, 600, 16)
    valid = jnp.asarray([600, 450, 123], jnp.int32)
    eot = jnp.asarray([599, 449, 10], jnp.int32)
    out_b, aux_b = _pallas_attention_blocked(
        q, k, v, valid, eot, causal=True, with_aux=True, interpret=True
    )
    out_r, aux_r = attention_reference(
        q, k, v, causal=True, kv_valid_len=valid, attn_to_idx=eot
    )
    # compare only valid query rows (rows past `valid` are never consumed)
    for b, vl in enumerate([600, 450, 123]):
        np.testing.assert_allclose(
            np.asarray(out_b)[b, :, :vl], np.asarray(out_r)[b, :, :vl],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(aux_b)[b, :vl], np.asarray(aux_r)[b, :vl],
            rtol=1e-4, atol=1e-6,
        )


def test_no_aux_path(rng):
    q, k, v = _qkv(rng, 1, 2, 300, 16)
    valid = jnp.full((1,), 300, jnp.int32)
    eot = jnp.zeros((1,), jnp.int32)
    out_b, aux = _pallas_attention_blocked(
        q, k, v, valid, eot, causal=False, with_aux=False, interpret=True
    )
    assert aux is None
    out_r, _ = attention_reference(q, k, v, kv_valid_len=valid)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r), rtol=1e-4, atol=1e-5)


def test_long_sequence_dispatch(rng):
    """fused_attention auto-dispatches to the blocked path past the cap."""
    from tapclip_tpu.ops.flash_attention import fused_attention

    T = 2100  # > _MAX_SINGLE_BLOCK_T
    q, k, v = _qkv(rng, 1, 1, T, 8)
    out, aux = fused_attention(q, k, v, attn_to_idx=T - 1, interpret=True)
    out_r, aux_r = attention_reference(q, k, v, attn_to_idx=T - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux), np.asarray(aux_r), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_blocked_backward_matches_xla(rng, causal):
    """Past the single-block cap, the blockwise FA2-style Pallas backward
    (LSE recompute + dkv + dq kernels) must match XLA autodiff through the
    reference attention — the last XLA training escape is gone."""
    from tapclip_tpu.ops.flash_attention import fused_attention

    T = 2100  # > _MAX_SINGLE_BLOCK_T -> blocked fwd AND bwd
    q, k, v = _qkv(rng, 2, 2, T, 16)
    valid = jnp.asarray([T, 1531], jnp.int32)
    g_out = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def pallas_loss(q_, k_, v_):
        out, _ = fused_attention(
            q_, k_, v_, causal=causal, kv_valid_len=valid, interpret=True
        )
        return jnp.vdot(out, g_out)

    def xla_loss(q_, k_, v_):
        out, _ = attention_reference(
            q_, k_, v_, causal=causal, kv_valid_len=valid
        )
        return jnp.vdot(out, g_out)

    gp = jax.grad(pallas_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
        # Query rows past `valid` of batch 1 differ only in never-consumed
        # positions for dq (reference computes them identically); compare all.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_blocked_backward_variable_eot_aux_stopgrad(rng):
    """The aux output's cotangent is structurally zero on the blocked path
    too: differentiating a function of the OUTPUT while aux is computed
    must equal differentiating without aux."""
    from tapclip_tpu.ops.flash_attention import fused_attention

    T = 2100
    q, k, v = _qkv(rng, 1, 2, T, 16)

    def with_aux_loss(q_):
        out, aux = fused_attention(q_, k, v, attn_to_idx=T - 1, interpret=True)
        return jnp.sum(out ** 2)

    def no_aux_loss(q_):
        out, _ = fused_attention(q_, k, v, interpret=True)
        return jnp.sum(out ** 2)

    ga = jax.grad(with_aux_loss)(q)
    gb = jax.grad(no_aux_loss)(q)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-6)
