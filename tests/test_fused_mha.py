"""Packed-QKV fused MHA kernel tests (vision-tower fast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.fused_mha import fused_mha


def _ref(qkv, H):
    B, T, threeW = qkv.shape
    W = threeW // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, H, W // H).transpose(0, 2, 1, 3)

    out, _ = attention_reference(heads(q), heads(k), heads(v))
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


@pytest.mark.parametrize(
    "B,T,H,Dh",
    [
        (3, 13, 4, 8),  # XLA fallback path (alignment)
        (2, 50, 2, 64),  # kernel path, one head-pair group
        (5, 197, 4, 64),  # kernel path, ViT-like Dh
        (2, 30, 2, 128),  # kernel path, Dh == lane width
    ],
)
def test_matches_reference(rng, B, T, H, Dh):
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * Dh)), jnp.float32)
    out = fused_mha(qkv, H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(qkv, H)), rtol=2e-4, atol=2e-4
    )


def test_bf16(rng):
    qkv = jnp.asarray(rng.standard_normal((2, 10, 3 * 32)), jnp.bfloat16)
    out = fused_mha(qkv, 4, interpret=True)
    ref = _ref(qkv, 4)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_odd_batch_block(rng):
    # B=5 with block_b=4 -> falls back to a divisor block
    qkv = jnp.asarray(rng.standard_normal((5, 9, 3 * 16)), jnp.float32)
    out = fused_mha(qkv, 2, block_b=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(qkv, 2)), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("T,valid", [(24, 19), (40, 33)])
def test_attn_block_pair_packed_matches_perhead(rng, T, valid):
    """The pair-packed forward schedule (both Dh=64 heads of a group as one
    block-diagonal contraction; scripts/head_pack_ab.py) must match the
    per-head path — the packed operand entries are exact zeros, so only
    reduction-tree pairing differs (bit-identical on chip, ulp here)."""
    from tapclip_tpu.ops.fused_mha import _attn_block_fwd_impl
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    B, W, H = 2, 128, 2  # Dh=64 -> heads_per_group=2
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(3), W)
    args = (x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], attn["b_out"], H, valid, 1e-5, 2, True)
    a = _attn_block_fwd_impl(*args, pair_packed=False)
    b = _attn_block_fwd_impl(*args, pair_packed=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_pick_block_b_models_pair_packed_footprint():
    """The VMEM picker must budget the schedule that will run: the packed
    schedule keeps [T,2T] s/p tiles plus the block-diagonal operands live
    (round-4 review), while the proven ViT-L/14 224px packed config must
    keep its measured bb=8 (971 img/s run)."""
    from tapclip_tpu.ops.fused_mha import _pick_attn_block_b

    # ViT-L/14 224px: per-head and packed both pick 8 (the packed budget is
    # anchored by the compile that produced the 971 img/s measurement).
    assert _pick_attn_block_b(64, 264, 1024, 8, pair_packed=False) == 8
    assert _pick_attn_block_b(64, 264, 1024, 8, pair_packed=True) == 8
    # Longer Dh=64 geometries: the packed footprint must never pick a
    # bigger block than the per-head one, and at T=832 it strictly steps
    # down (2 -> 1) — the [T,2T] tiles bind.
    for T in (320, 448, 576, 832):
        bb_ph = _pick_attn_block_b(64, T, 1024, 8, pair_packed=False)
        bb_pp = _pick_attn_block_b(64, T, 1024, 8, pair_packed=True)
        assert bb_pp <= bb_ph
    assert _pick_attn_block_b(64, 832, 1024, 8, pair_packed=True) == 1
    assert _pick_attn_block_b(64, 832, 1024, 8, pair_packed=False) == 2


def test_pair_pack_routing_rule():
    """The auto rule packs exactly when the doubled lane axis rounds up to
    less than two per-head round-ups (chip A/B: ViT-L T=264 wins, ViT-B
    T=200 and ViT-L@336 T=584 are washes)."""
    from tapclip_tpu.ops.fused_mha import _pair_pack_wins

    assert _pair_pack_wins(264)       # 640 < 2*384 (ViT-L/14 224px)
    assert not _pair_pack_wins(200)   # 512 = 2*256 (ViT-B/16)
    assert not _pair_pack_wins(584)   # 1280 = 2*640 (ViT-L/14 336px)
    assert not _pair_pack_wins(256)   # exact multiple: no round-up at all
    assert _pair_pack_wins(320)       # 640 < 2*384


def test_bwd_stage_batched_routing_rule():
    """The backward auto rule stage-batches exactly where the chip A/B
    measured a win (fresh-inputs-per-rep harness): ViT-B T=200 (0.87-0.94x
    over 14 reps), NOT ViT-L T=264 (1.035x), never causal (unmeasured),
    never Dh!=64 (no head pairs to batch); explicit override always wins."""
    from tapclip_tpu.ops.fused_mha import (
        _bwd_stage_batched_wins,
        _resolve_bwd_stage_batched,
    )

    assert _bwd_stage_batched_wins(200, 768, 12)       # ViT-B/16: measured win
    assert not _bwd_stage_batched_wins(264, 1024, 16)  # ViT-L/14: measured loss
    assert not _bwd_stage_batched_wins(584, 1024, 16)  # ViT-L@336: > 2 tiles
    assert not _bwd_stage_batched_wins(200, 768, 6)    # Dh=128: 1 head/group
    assert _resolve_bwd_stage_batched(200, 768, 12)
    assert not _resolve_bwd_stage_batched(200, 768, 12, causal=True)
    assert _resolve_bwd_stage_batched(264, 1024, 16, stage_batched=True)
    assert not _resolve_bwd_stage_batched(200, 768, 12, stage_batched=False)


def test_auto_routing_on_cpu_stays_xla(tiny_cfg, tiny_params, rng):
    """On CPU the auto policy must not pick the fused kernel (interpret mode
    is for tests only); encode_image must still work."""
    from tapclip_tpu.models import clip as C

    imgs = jnp.asarray(
        rng.standard_normal((2, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    feats = C.encode_image(tiny_params, tiny_cfg, imgs)
    assert feats.shape == (2, tiny_cfg.embed_dim)


def _ref_causal(qkv, H, valid=None, causal=True):
    B, T, threeW = qkv.shape
    W = threeW // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, H, W // H).transpose(0, 2, 1, 3)

    out, _ = attention_reference(
        heads(q), heads(k), heads(v), causal=causal,
        kv_valid_len=None if valid in (None, T) else valid,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


@pytest.mark.parametrize("T,valid", [(48, None), (80, 77)])
def test_causal_matches_reference(rng, T, valid):
    """Causal masking (text tower) in the packed-QKV kernel: forward parity
    vs the XLA oracle, including padded keys."""
    H, Dh = 2, 64
    qkv = jnp.asarray(rng.standard_normal((2, T, 3 * H * Dh)), jnp.float32)
    out = fused_mha(qkv, H, valid_len=valid, causal=True, interpret=True)
    ref = _ref_causal(qkv, H, valid=valid)
    vl = valid or T
    np.testing.assert_allclose(
        np.asarray(out)[:, :vl], np.asarray(ref)[:, :vl], rtol=2e-4, atol=2e-4
    )


def test_causal_grad_matches_reference(rng):
    """The dedicated backward kernel honors the causal mask: dqkv parity vs
    XLA autodiff through the reference."""
    H, Dh, T = 2, 64, 48
    qkv = jnp.asarray(rng.standard_normal((2, T, 3 * H * Dh)), jnp.float32)
    g_out = jnp.asarray(rng.standard_normal((2, T, H * Dh)), jnp.float32)

    gk = jax.grad(
        lambda a: jnp.vdot(fused_mha(a, H, causal=True, interpret=True), g_out)
    )(qkv)
    gr = jax.grad(lambda a: jnp.vdot(_ref_causal(a, H), g_out))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)
