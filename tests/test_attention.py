"""Attention op tests: XLA reference numerics + Pallas kernel parity.

The Pallas kernel runs in interpreter mode on CPU (same program, no TPU
needed) — the parity contract from SURVEY.md §4: "attribution output of the
Pallas kernel == attribution computed from a naive attention reference".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.flash_attention import fused_attention


def _qkv(rng, B=2, H=3, T=10, Dh=8):
    q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    return q, k, v


def test_reference_softmax_rows_sum_to_one(rng):
    q, k, v = _qkv(rng)
    out, aux = attention_reference(q, k, v, attn_to_idx=3)
    assert out.shape == q.shape
    assert aux.shape == (2, 10)
    # aux is a probability (head-mean of a softmax entry)
    assert (np.asarray(aux) >= 0).all() and (np.asarray(aux) <= 1).all()


def test_reference_matches_manual_softmax(rng):
    q, k, v = _qkv(rng, B=1, H=1, T=6, Dh=4)
    out, aux = attention_reference(q, k, v, attn_to_idx=5)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(4)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux), p[:, 0, :, 5], rtol=1e-5, atol=1e-6)


def test_reference_causal_mask(rng):
    q, k, v = _qkv(rng, B=1, H=2, T=5, Dh=4)
    out, _ = attention_reference(q, k, v, causal=True)
    # First query position can only attend to key 0 -> out[0] == v[0] exactly.
    np.testing.assert_allclose(
        np.asarray(out)[0, :, 0], np.asarray(v)[0, :, 0], rtol=1e-5, atol=1e-5
    )


def test_reference_kv_valid_len_masks_tail(rng):
    q, k, v = _qkv(rng, B=2, H=2, T=8, Dh=4)
    out_full, _ = attention_reference(q[:, :, :, :], k[:, :, :6], v[:, :, :6])
    out_masked, _ = attention_reference(q, k, v, kv_valid_len=6)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_masked), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("T", [10, 82, 130])
def test_pallas_matches_reference(rng, causal, T):
    q, k, v = _qkv(rng, B=2, H=2, T=T, Dh=16)
    out_ref, aux_ref = attention_reference(
        q, k, v, causal=causal, attn_to_idx=T - 1
    )
    out_pl, aux_pl = fused_attention(
        q, k, v, causal=causal, attn_to_idx=T - 1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux_pl), np.asarray(aux_ref), rtol=2e-4, atol=2e-5)


def test_pallas_valid_len_and_per_batch_idx(rng):
    q, k, v = _qkv(rng, B=3, H=2, T=20, Dh=8)
    idx = jnp.asarray([4, 9, 14])
    out_ref, aux_ref = attention_reference(
        q, k, v, kv_valid_len=jnp.asarray([15, 15, 15]), attn_to_idx=idx
    )
    out_pl, aux_pl = fused_attention(
        q, k, v, kv_valid_len=jnp.asarray([15, 15, 15]), attn_to_idx=idx, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux_pl), np.asarray(aux_ref), rtol=2e-4, atol=2e-5)


def test_pallas_bf16_inputs(rng):
    q, k, v = _qkv(rng, B=1, H=2, T=16, Dh=8)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out_ref, _ = attention_reference(qb, kb, vb)
    out_pl, _ = fused_attention(qb, kb, vb, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_pl, np.float32), np.asarray(out_ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_pallas_gradients_flow(rng):
    q, k, v = _qkv(rng, B=1, H=1, T=8, Dh=4)

    def loss_pl(q, k, v):
        out, _ = fused_attention(q, k, v, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        out, _ = attention_reference(q, k, v)
        return jnp.sum(out ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
