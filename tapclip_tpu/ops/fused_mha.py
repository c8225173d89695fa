"""Fused multi-head attention over packed QKV (vision-tower hot path).

Motivation (measured on v5e, ViT-B/16 bs=256): XLA's attention lowering
materializes the ``[B, H, T, T]`` probability tensor in HBM and needs four
layout copies per block for the head split/merge transposes — together a
meaningful slice of the ~10 ms/layer vision cost.  This kernel:

* consumes the packed ``[B, T, 3W]`` QKV projection directly (no head
  transpose in XLA-land; heads are sliced inside VMEM),
* keeps each ``[T, T]`` score tile in VMEM scratch (never in HBM),
* writes the attention output back as ``[B, T, W]`` — exactly the layout the
  out-projection GEMM wants.

Grid: ``(B / bB,)`` batch blocks; heads iterated as a static Python loop in
the kernel (each head's matmuls hit the MXU back to back).  Sequence length
is padded to a sublane multiple by the caller; padded keys are masked.

Causal masking is supported (static flag; the text tower routes here).
No aux support — the aux-bearing kernel (per-batch masks, EOT attribution
column) lives in ``flash_attention.py``.  Fully differentiable: the custom
VJP saves the packed qkv and runs a dedicated Pallas backward kernel
(``_mha_bwd_kernel``) that recomputes the score tiles in VMEM and emits the
packed dqkv — training never round-trips ``[B, H, T, T]`` through HBM either.
The monolithic half-block (``fused_attn_block``) likewise has a dedicated
backward (``_attn_block_bwd_kernel``: in-VMEM LN/qkv/probability recompute,
grid-resident f32 weight-gradient accumulators), with the split composition
as its fallback when the VMEM footprint does not fit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_LOG2E = 1.4426950408889634


def _mha_kernel(
    qkv_ref,  # VMEM [bB, Tp, 3W]
    o_ref,  # VMEM [bB, Tp, W]
    *,
    n_heads: int,
    width: int,
    valid: int,
    scale: float,
    causal: bool = False,
):
    bB, Tp, _ = qkv_ref.shape
    Dh = width // n_heads
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        key_mask = jnp.logical_and(key_mask, ki <= qi)
    neg = jnp.float32(-1e30)

    # fori_loop over (batch-in-block, head-group) — an unrolled Python loop
    # blows up Mosaic compile time (>10 min remote compile for 48 static
    # iterations).  Dynamic lane-dim slices must be 128-aligned, so heads are
    # processed in groups of 128/Dh lanes and split statically in-register.
    heads_per_group = max(1, 128 // Dh)
    assert n_heads % heads_per_group == 0, (n_heads, Dh)
    n_groups = n_heads // heads_per_group
    group_w = heads_per_group * Dh  # 128 (or Dh when Dh >= 128)

    def one_head_batched(q, k, v):
        # q,k: [bB, Tp, Dh] f32; v: [bB, Tp, Dh] input dtype
        s = jax.lax.dot_general(
            q,
            k,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tp, Tp]
        # exp2 softmax with deferred normalisation (see _attn_block_kernel).
        s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tp, Dh]
        return o / l

    def body(g, carry):
        off = pl.multiple_of(g * group_w, group_w)
        qg = qkv_ref[:, :, pl.ds(off, group_w)].astype(jnp.float32)
        kg = qkv_ref[:, :, pl.ds(width + off, group_w)].astype(jnp.float32)
        vg = qkv_ref[:, :, pl.ds(2 * width + off, group_w)]
        outs = [
            one_head_batched(
                qg[:, :, i * Dh : (i + 1) * Dh],
                kg[:, :, i * Dh : (i + 1) * Dh],
                vg[:, :, i * Dh : (i + 1) * Dh],
            )
            for i in range(heads_per_group)
        ]
        o_ref[:, :, pl.ds(off, group_w)] = jnp.concatenate(outs, axis=-1).astype(
            o_ref.dtype
        )
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


def _mha_bwd_kernel(
    qkv_ref,  # VMEM [bB, Tp, 3W] saved forward input
    g_ref,  # VMEM [bB, Tp, W] output cotangent
    dqkv_ref,  # VMEM [bB, Tp, 3W]
    *,
    n_heads: int,
    width: int,
    valid: int,
    scale: float,
    causal: bool = False,
):
    """Packed-QKV attention backward: recompute scores, emit packed dqkv.

    Standard softmax-attention gradient (the short-sequence single-block
    analogue of the flash-attention dq/dk/dv scheme): per head,
    ``p = softmax(mask(q kᵀ · scale))`` is recomputed from the saved qkv, then
        dv = pᵀ g,   dp = g vᵀ,   ds = p ⊙ (dp − rowsum(dp ⊙ p)) · scale,
        dq = ds k,   dk = dsᵀ q.
    Masked (padded) keys have p = 0 exactly, so their ds vanishes; padded
    query rows carry g = 0 from the caller.  Same head-group layout rules as
    the forward (128-lane-aligned dynamic slices, fori_loop over groups).
    """
    bB, Tp, _ = qkv_ref.shape
    Dh = width // n_heads
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        key_mask = jnp.logical_and(key_mask, ki <= qi)
    neg = jnp.float32(-1e30)

    heads_per_group = max(1, 128 // Dh)
    n_groups = n_heads // heads_per_group
    group_w = heads_per_group * Dh

    def one_head(q, k, v, gh):
        # q, k [bB, Tp, Dh] f32; v, gh in input dtype.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [bB, Tq, Tk] f32
        g32 = gh.astype(jnp.float32)
        dv = jax.lax.dot_general(
            p.astype(gh.dtype), gh,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tk, Dh]
        dp = jax.lax.dot_general(
            g32, v.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tq, Tk]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [bB, Tq, Dh]
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [bB, Tk, Dh]
        return dq, dk, dv

    def body(grp, carry):
        off = pl.multiple_of(grp * group_w, group_w)
        qg = qkv_ref[:, :, pl.ds(off, group_w)].astype(jnp.float32)
        kg = qkv_ref[:, :, pl.ds(width + off, group_w)].astype(jnp.float32)
        vg = qkv_ref[:, :, pl.ds(2 * width + off, group_w)]
        gg = g_ref[:, :, pl.ds(off, group_w)]
        dqs, dks, dvs = [], [], []
        for i in range(heads_per_group):
            sl = slice(i * Dh, (i + 1) * Dh)
            dq, dk, dv = one_head(qg[:, :, sl], kg[:, :, sl], vg[:, :, sl], gg[:, :, sl])
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, pl.ds(off, group_w)] = jnp.concatenate(dqs, -1).astype(dt)
        dqkv_ref[:, :, pl.ds(width + off, group_w)] = jnp.concatenate(dks, -1).astype(dt)
        dqkv_ref[:, :, pl.ds(2 * width + off, group_w)] = jnp.concatenate(dvs, -1).astype(dt)
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


def _fused_mha_bwd_impl(
    qkv: jnp.ndarray,  # [B, T, 3W]
    g: jnp.ndarray,  # [B, T, W]
    n_heads: int,
    valid: int,
    block_b: int,
    interpret: Optional[bool],
    causal: bool = False,
) -> jnp.ndarray:
    B, T, threeW = qkv.shape
    W = threeW // 3
    Dh = W // n_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Tp = _round_up(T, 8)
    if Tp != T:
        qkv = jnp.pad(qkv, [(0, 0), (0, Tp - T), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, Tp - T), (0, 0)])
    # Backward holds two extra f32 score tiles (p, dp) plus the g block and
    # the dqkv output — shrink the batch block until it fits.
    bB = min(block_b, B)
    while bB > 1 and (
        B % bB
        or bB * Tp * (3 * W * 2 * 2 + W * 2 + 3 * W * 2 * 2 + 3 * Tp * 4) > 13 * 2 ** 20
    ):
        bB -= 1
    while B % bB:
        bB -= 1

    kernel = functools.partial(
        _mha_bwd_kernel, n_heads=n_heads, width=W, valid=valid,
        scale=Dh ** -0.5, causal=causal,
    )
    dqkv = pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, Tp, 3 * W), lambda i: (i, 0, 0)),
            pl.BlockSpec((bB, Tp, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, Tp, 3 * W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, 3 * W), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * n_heads * Tp * Tp * Dh,
            bytes_accessed=(3 + 1 + 3) * B * Tp * W * qkv.dtype.itemsize,
            transcendentals=B * n_heads * Tp * Tp,
        ),
        interpret=interpret,
    )(qkv, g)
    return dqkv[:, :T, :]


def _xla_reference(qkv: jnp.ndarray, n_heads: int, valid: Optional[int] = None,
                   causal: bool = False) -> jnp.ndarray:
    """Same math in plain XLA (used for the backward pass)."""
    from tapclip_tpu.ops.attention import attention_reference

    B, T, threeW = qkv.shape
    W = threeW // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, n_heads, W // n_heads).transpose(0, 2, 1, 3)

    kv_valid = None if (valid is None or valid == T) else valid
    out, _ = attention_reference(
        heads(q), heads(k), heads(v), kv_valid_len=kv_valid, causal=causal
    )
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _fused_mha_vjp(qkv, n_heads, valid, block_b, interpret, causal):
    return _fused_mha_fwd_impl(qkv, n_heads, valid, block_b, interpret, causal)


def _fused_mha_fwd(qkv, n_heads, valid, block_b, interpret, causal):
    return _fused_mha_vjp(qkv, n_heads, valid, block_b, interpret, causal), qkv


def _fused_mha_bwd(n_heads, valid, block_b, interpret, causal, qkv, g):
    return (
        _fused_mha_bwd_impl(qkv, g, n_heads, valid, block_b, interpret, causal),
    )


_fused_mha_vjp.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_mha(
    qkv: jnp.ndarray,  # [B, T, 3W] packed (q | k | v), bias already added
    n_heads: int,
    *,
    valid_len: Optional[int] = None,
    block_b: int = 4,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Packed-QKV multi-head self attention -> ``[B, T, W]``.

    Differentiable: a dedicated Pallas backward kernel recomputes the score
    tiles from the saved qkv and emits packed dqkv (no XLA recompute, no
    ``[B, H, T, T]`` HBM materialization in either direction).  Falls back to
    the XLA path when the head layout can't satisfy the 128-lane
    dynamic-slice alignment (tiny test configs).
    """
    B, T, threeW = qkv.shape
    W = threeW // 3
    Dh = W // n_heads
    heads_per_group = max(1, 128 // Dh)
    valid = valid_len if valid_len is not None else T
    if n_heads % heads_per_group != 0:
        return _xla_reference(qkv, n_heads, valid, causal)
    # VMEM-fit the batch block: double-buffered qkv-in + out blocks plus the
    # per-head f32 score tile.
    Tp = _round_up(T, 8)
    bb = block_b
    while bb > 1 and (
        bb > B
        or B % bb
        or bb * Tp * (3 * W * 2 * 2 + W * 2 * 2 + Tp * 8) > 13 * 2 ** 20
    ):
        bb -= 1
    return _fused_mha_vjp(qkv, n_heads, valid, bb, interpret, causal)


def _fused_mha_fwd_impl(
    qkv: jnp.ndarray,
    n_heads: int,
    valid: Optional[int] = None,
    block_b: int = 4,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    B, T, threeW = qkv.shape
    W = threeW // 3
    Dh = W // n_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if valid is None:
        valid = T

    Tp = _round_up(T, 8)
    if Tp != T:
        qkv = jnp.pad(qkv, [(0, 0), (0, Tp - T), (0, 0)])
    bB = min(block_b, B)
    while B % bB:
        bB -= 1

    kernel = functools.partial(
        _mha_kernel, n_heads=n_heads, width=W, valid=valid,
        scale=Dh ** -0.5, causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[pl.BlockSpec((bB, Tp, 3 * W), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bB, Tp, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, W), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n_heads * Tp * Tp * Dh,
            bytes_accessed=(3 + 1) * B * Tp * W * qkv.dtype.itemsize,
            transcendentals=B * n_heads * Tp * Tp,
        ),
        interpret=interpret,
    )(qkv)
    return out[:, :T, :]


# ---------------------------------------------------------------------------
# Fully-fused attention half-block: LN -> QKV -> MHA -> out-proj -> +residual
# ---------------------------------------------------------------------------


def _pair_packed_attention(qg, kg, vg, *, valid: int, scale: float):
    """Both heads of a Dh=64 group as ONE full-geometry contraction pair.

    Per-head score/output GEMMs waste half the 128-deep MXU (K=Dh=64)
    and round the [Tp] lane axis up per head (Tp=264 -> 384 at ViT-L).
    Packing the pair block-diagonally — Kbd/Vbd [2Tp, 128] with head 0
    in rows [0,Tp) lanes [0,Dh) and head 1 in rows [Tp,2Tp) lanes
    [Dh,128) — makes both GEMMs full 128-deep/128-wide while the added
    operand entries are EXACT zeros: each partial sum is unchanged, so
    the result differs from the per-head path only by reduction-tree
    pairing (bit-identical on the MXU's sequential K accumulation,
    ulp-level elsewhere).  Tile arithmetic: useful/padded
    MACs rise from (64/128)·(264/384)=34% to (2·264·64)/(640·128)=41%
    at ViT-L geometry (the win is the 2Tp=528->640 lane round-up
    amortization; at ViT-B's Tp=200, 400->512 = 2·256 is a wash).
    Non-causal only (the causal mask is not block-diagonal-segment
    uniform).

    Module-level (kernel-agnostic: only `jnp` on VMEM values) so the bf16
    block kernel and the int8 block kernel share one implementation —
    ``qg``/``kg`` f32 [bB, Tp, 2·Dh], ``vg`` in the p·v compute dtype;
    returns the normalized per-pair output [bB, Tp, 2·Dh] f32.
    """
    _, Tp, two_dh = qg.shape
    Dh = two_dh // 2
    neg = jnp.float32(-1e30)
    T2 = 2 * Tp
    rr = jax.lax.broadcasted_iota(jnp.int32, (T2, 2 * Dh), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (T2, 2 * Dh), 1)
    bd = ((rr < Tp) == (ll < Dh))[None]  # block-diagonal selector
    kbd = jnp.where(bd, jnp.concatenate([kg, kg], axis=1), 0.0)
    s = jax.lax.dot_general(  # [bB, Tp, 2Tp] — both heads' scores
        qg, kbd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, T2), 1)
    seg1 = (col >= Tp)[None]
    keypos = col - jnp.where(col >= Tp, Tp, 0)
    s = jnp.where((keypos < valid)[None], s * (scale * _LOG2E), neg)
    m0 = jnp.max(jnp.where(seg1, neg, s), axis=-1, keepdims=True)
    m1 = jnp.max(jnp.where(seg1, s, neg), axis=-1, keepdims=True)
    p = jnp.exp2(s - jnp.where(seg1, m1, m0))  # segment-wise softmax
    l0 = jnp.sum(jnp.where(seg1, 0.0, p), axis=-1, keepdims=True)
    l1 = jnp.sum(jnp.where(seg1, p, 0.0), axis=-1, keepdims=True)
    vbd = jnp.where(
        bd, jnp.concatenate([vg, vg], axis=1), jnp.zeros((), vg.dtype)
    )
    o = jax.lax.dot_general(  # [bB, Tp, 128] = [o_h0 | o_h1]
        p.astype(vg.dtype), vbd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (Tp, 2 * Dh), 1)
    return o / jnp.where((lane_o < Dh)[None], l0, l1)


def _pair_packed_attention_bwd(qg, kg, vg, gg, *, valid: int, scale: float,
                               dt):
    """Backward of one Dh=64 head pair as packed full-geometry contractions.

    The forward pack (``_pair_packed_attention``) wins 0.833x at ViT-L
    geometry by amortizing the [Tp] lane round-up (2Tp=528 -> 640 vs
    2x(264 -> 384)); every GEMM of the softmax-attention gradient chain has
    the same round-up structure, so the whole chain is packed here:

      s  = qg @ Kbdᵀ            [Tp, 2Tp]   (exact: Kbd zero off-block)
      p  = segment-softmax(s)               (normalized — bwd needs p)
      o  = p @ Vbd              [Tp, 128]   = [o_h0 | o_h1]
      dv = pᵀ @ gg              [2Tp, 128]  off-block lanes garbage, selected
      dp = gg @ Vbdᵀ            [Tp, 2Tp]   (exact)
      ds = p (dp - rowsum_seg(dp p)) scale
      dq = ds @ Kbd             [Tp, 128]   (exact)
      dk = dsᵀ @ qg             [2Tp, 128]  off-block lanes garbage, selected

    qg/kg/vg/gg are [bB, Tp, 2·Dh] f32 (both heads' lanes); returns
    (o, dq, dk, dv) each [bB, Tp, 2·Dh] f32 in the same packed-lane group
    layout.  Results differ from the per-head chain only by reduction-tree
    pairing (f32 ulp).  Non-causal only."""
    bB, Tp, two_dh = qg.shape
    Dh = two_dh // 2
    neg = jnp.float32(-1e30)
    T2 = 2 * Tp
    rr = jax.lax.broadcasted_iota(jnp.int32, (T2, two_dh), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (T2, two_dh), 1)
    bd = ((rr < Tp) == (ll < Dh))[None]  # block-diagonal selector
    kbd = jnp.where(bd, jnp.concatenate([kg, kg], axis=1), 0.0)
    vbd = jnp.where(bd, jnp.concatenate([vg, vg], axis=1), 0.0)

    s = jax.lax.dot_general(  # [bB, Tp, 2Tp] — both heads' scores
        qg, kbd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, T2), 1)
    seg1 = (col >= Tp)[None]
    keypos = col - jnp.where(col >= Tp, Tp, 0)
    s = jnp.where((keypos < valid)[None], s * (scale * _LOG2E), neg)
    m0 = jnp.max(jnp.where(seg1, neg, s), axis=-1, keepdims=True)
    m1 = jnp.max(jnp.where(seg1, s, neg), axis=-1, keepdims=True)
    e = jnp.exp2(s - jnp.where(seg1, m1, m0))
    l0 = jnp.sum(jnp.where(seg1, 0.0, e), axis=-1, keepdims=True)
    l1 = jnp.sum(jnp.where(seg1, e, 0.0), axis=-1, keepdims=True)
    p = e / jnp.where(seg1, l1, l0)  # [bB, Tp, 2Tp] normalized per segment
    pc = p.astype(dt)

    o = jax.lax.dot_general(  # [bB, Tp, 128] = [o_h0 | o_h1]
        pc, vbd.astype(dt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    gc = gg.astype(dt)
    dv_pk = jax.lax.dot_general(  # [bB, 2Tp, 128]
        pc, gc, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # [bB, Tp, 2Tp]
        gg, vbd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    r0 = jnp.sum(jnp.where(seg1, 0.0, dp * p), axis=-1, keepdims=True)
    r1 = jnp.sum(jnp.where(seg1, dp * p, 0.0), axis=-1, keepdims=True)
    ds = p * (dp - jnp.where(seg1, r1, r0)) * scale
    dq = jax.lax.dot_general(  # [bB, Tp, 128] (exact: kbd zero off-block)
        ds, kbd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk_pk = jax.lax.dot_general(  # [bB, 2Tp, 128]
        ds, qg, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    lane = (jax.lax.broadcasted_iota(jnp.int32, (Tp, two_dh), 1) < Dh)[None]
    dv = jnp.where(lane, dv_pk[:, :Tp, :], dv_pk[:, Tp:, :])
    dk = jnp.where(lane, dk_pk[:, :Tp, :], dk_pk[:, Tp:, :])
    return o, dq, dk, dv


def _attn_block_kernel(
    x_ref,  # VMEM [bB, Tp, W] residual input (pre-LN)
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wqkv_ref,  # VMEM [W, 3W]
    bqkv_ref,  # VMEM [1, 3W] f32
    wout_ref,  # VMEM [W, W]
    bout_ref,  # VMEM [1, W] f32
    o_ref,  # VMEM [bB, Tp, W]
    attn_s,  # VMEM scratch [bB, Tp, W]
    *,
    n_heads: int,
    valid: int,
    eps: float,
    causal: bool = False,
    pair_packed: bool = False,
):
    """Per head-group the q/k/v projections are computed as column slices of
    the qkv GEMM inside the group loop (instead of one monolithic GEMM into a
    [bB, Tp, 3W] scratch): the GEMM work interleaves with the attention math
    across groups, keeping the MXU fed while the VPU runs softmax — measured
    2.17 -> 1.95 ms/layer (ViT-B/16 geometry, 63.8 -> 70.9% of roofline,
    bit-exact; docs/PERF.md round-2 table)."""
    bB, Tp, W = x_ref.shape
    Dh = W // n_heads
    scale = Dh ** -0.5
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        key_mask = jnp.logical_and(key_mask, ki <= qi)
    neg = jnp.float32(-1e30)

    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma_ref[0] + beta_ref[0]).astype(x.dtype)
    y2 = y.reshape(bB * Tp, W)

    heads_per_group = max(1, 128 // Dh)
    n_groups = n_heads // heads_per_group
    group_w = heads_per_group * Dh

    def one_head_batched(q, k, v):
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # softmax via exp2 with scale·log2(e) folded into one multiply, and
        # the 1/l normalisation deferred past the p·v dot — the divide
        # shrinks from [Tp, Tp] to [Tp, Dh] elements.  Measured 13% on the
        # isolated kernel at ViT-L geometry (T=264), ~1% at ViT-B (T=200).
        s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return o / l

    def pair_packed_group(qg, kg, vg):
        return _pair_packed_attention(qg, kg, vg, valid=valid, scale=scale)

    def proj_group(col_off):
        g = jax.lax.dot_general(
            y2,
            wqkv_ref[:, pl.ds(col_off, group_w)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (g + bqkv_ref[0, pl.ds(col_off, group_w)]).reshape(bB, Tp, group_w)

    def body(g, carry):
        off = pl.multiple_of(g * group_w, group_w)
        qg = proj_group(off)
        kg = proj_group(W + off)
        vg = proj_group(2 * W + off).astype(x.dtype)
        if pair_packed:
            outs = [pair_packed_group(qg, kg, vg)]
        else:
            outs = [
                one_head_batched(
                    qg[:, :, i * Dh : (i + 1) * Dh],
                    kg[:, :, i * Dh : (i + 1) * Dh],
                    vg[:, :, i * Dh : (i + 1) * Dh],
                )
                for i in range(heads_per_group)
            ]
        attn_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(outs, axis=-1).astype(
            attn_s.dtype
        )
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)

    out = jax.lax.dot_general(
        attn_s[:].reshape(bB * Tp, W),
        wout_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (
        (out + bout_ref[0]).reshape(bB, Tp, W) + x32
    ).astype(o_ref.dtype)


def _attn_block_bwd_kernel(
    x_ref,  # VMEM [bB, Tp, W] saved residual input (pre-LN)
    g_ref,  # VMEM [bB, Tp, W] output cotangent
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wqkv_ref,  # VMEM [W, 3W]
    bqkv_ref,  # VMEM [1, 3W] f32
    wout_ref,  # VMEM [W, W]
    dx_ref,  # VMEM [bB, Tp, W] out — blocked over the batch grid
    dgamma_ref,  # VMEM [1, W] f32 out — grid-resident accumulator
    dbeta_ref,  # VMEM [1, W] f32 out
    dwqkv_ref,  # VMEM [W, 3W] f32 out
    dbqkv_ref,  # VMEM [1, 3W] f32 out
    dwout_ref,  # VMEM [W, W] f32 out
    dbout_ref,  # VMEM [1, W] f32 out
    attn_s,  # VMEM scratch [bB, Tp, W] — recomputed attention output
    dqkv_s,  # VMEM scratch [bB, Tp, 3W] — packed dqkv
    *extra_s,  # dw_interleave only: dy_s VMEM scratch [bB, Tp, W] f32
    n_heads: int,
    valid: int,
    eps: float,
    causal: bool = False,
    stage_batched: bool = False,
    dw_interleave: bool = False,
    pair_packed: bool = False,
):
    """Dedicated attention half-block backward (the MLP backward's design
    applied to attention): recompute LN + per-head-group qkv + probabilities
    for the batch block entirely in VMEM, run the softmax-attention gradient
    per head, then the projection/LN gradients — with grid-resident f32
    weight-gradient accumulators. Versus the split-composition VJP this
    avoids both the extra monolithic-forward recompute and every
    [bB, T, *]-tensor HBM round trip between the stages.

    ``dw_interleave`` (round-5 probe, VERDICT #4): compute the PREVIOUS
    group's dW/dy GEMM contributions inside the head-group loop — the
    ~90%-MXU weight-gradient GEMMs become independent work adjacent to the
    current group's VPU softmax-grad stages, targeting the ~0.7 ms/layer of
    exposed [T,T] VPU time the round-4 composed roofline identified.  Costs
    one extra [bB, Tp, W] f32 scratch (the dy accumulator) and slice-wise
    dwqkv/dwout writes.

    MEASURED NEGATIVE (scripts/attn_bwd_ab.py, v5e 2026-08-20, ViT-B
    pretraining geometry, 5 interleaved fresh-input reps): staged+dw 3.59 ms
    (auto bB=4) / 3.36 ms (bB=8 under an 80M budget) vs staged 3.15 ms —
    slicing the epilogue's [W, 3W]-output weight GEMMs into 128-column
    group chunks (N=2304 -> 6x N=128, y2 re-streamed per slice) costs more
    GEMM efficiency than the exposed-VPU overlap recovers.  Kept supported
    (numerics pinned in tests) but never auto-routed; see docs/PERF.md
    round-5 for the full falsification."""
    i = pl.program_id(0)
    bB, Tp, W = x_ref.shape
    Dh = W // n_heads
    scale = Dh ** -0.5
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        key_mask = jnp.logical_and(key_mask, ki <= qi)
    neg = jnp.float32(-1e30)

    x = x_ref[:]
    dt = x.dtype
    # --- recompute LN (matches _attn_block_kernel exactly) ---
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (x32 - mean) * rstd  # normalised, pre-affine
    y = (n * gamma_ref[0] + beta_ref[0]).astype(dt)
    y2 = y.reshape(bB * Tp, W)

    g32 = g_ref[:].astype(jnp.float32)
    gc = g32.astype(dt)
    g2 = gc.reshape(bB * Tp, W)

    heads_per_group = max(1, 128 // Dh)
    n_groups = n_heads // heads_per_group
    group_w = heads_per_group * Dh

    def datt_group(off):
        # d(attention output)[:, off:off+gw] = g @ w_out[off:off+gw, :]ᵀ —
        # computed per head group (ref slice on the sublane dim; a full
        # [bB, Tp, W] value cannot be dynamically sliced inside Mosaic, and
        # interleaving the GEMM with the attention math keeps the MXU fed,
        # mirroring the forward kernel's proj_group design).
        return jax.lax.dot_general(
            g2, wout_ref[pl.ds(off, group_w), :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(bB, Tp, group_w)

    def proj_group(col_off):
        g_ = jax.lax.dot_general(
            y2,
            wqkv_ref[:, pl.ds(col_off, group_w)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (g_ + bqkv_ref[0, pl.ds(col_off, group_w)]).reshape(bB, Tp, group_w)

    def one_head(q, k, v, gh):
        # q, k, v [bB, Tp, Dh] f32; gh [bB, Tp, Dh] f32 cotangent of o.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [bB, Tq, Tk] f32
        pc = p.astype(dt)
        o = jax.lax.dot_general(
            pc, v.astype(dt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tq, Dh]
        ghc = gh.astype(dt)
        dv = jax.lax.dot_general(
            pc, ghc, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tk, Dh]
        dp = jax.lax.dot_general(
            gh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bB, Tq, Tk]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return o, dq, dk, dv

    def stage_batched_heads(qg, kg, vg, gg):
        # Stage-batched schedule: run each stage of the softmax-gradient
        # chain for ALL heads in the group before advancing.  Per head the
        # chain is strictly serial (s->softmax->o/dv/dp->ds->dq/dk) so the
        # MXU idles through every VPU stage and vice versa; batching the
        # stages puts head h+1's independent GEMMs adjacent to head h's
        # VPU work, letting Mosaic's static scheduler overlap the units.
        # Costs ~1 extra live [Tp, Tp] f32 tile per extra head (see
        # _attn_block_bwd_fits).
        H = heads_per_group
        sls = [slice(h * Dh, (h + 1) * Dh) for h in range(H)]
        qs = [qg[:, :, sl] for sl in sls]
        ks = [kg[:, :, sl] for sl in sls]
        vs = [vg[:, :, sl] for sl in sls]
        gs = [gg[:, :, sl] for sl in sls]
        ss = [
            jnp.where(
                key_mask[None],
                jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * (scale * _LOG2E),
                neg,
            )
            for q, k in zip(qs, ks)
        ]
        ps = [
            jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True)) for s in ss
        ]
        ps = [e / jnp.sum(e, axis=-1, keepdims=True) for e in ps]
        pcs = [p.astype(dt) for p in ps]
        os_ = [
            jax.lax.dot_general(
                pc, v.astype(dt), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for pc, v in zip(pcs, vs)
        ]
        dvs = [
            jax.lax.dot_general(
                pc, gh.astype(dt), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for pc, gh in zip(pcs, gs)
        ]
        dps = [
            jax.lax.dot_general(
                gh, v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for gh, v in zip(gs, vs)
        ]
        dss = [
            p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
            for p, dp in zip(ps, dps)
        ]
        dqs = [
            jax.lax.dot_general(
                ds, k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for ds, k in zip(dss, ks)
        ]
        dks = [
            jax.lax.dot_general(
                ds, q, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for ds, q in zip(dss, qs)
        ]
        return os_, dqs, dks, dvs

    dy_s = extra_s[0] if dw_interleave else None

    def dw_group(poff):
        """dW/dy contributions of one (already-chained) head group.

        Returns (dwout rows [gw, W], 3x dwqkv cols [W, gw], dy [bB, Tp, W]).
        Slice-wise contraction order matches the monolithic epilogue GEMMs
        (in-order f32 accumulation over the same axes)."""
        a2 = attn_s[:, :, pl.ds(poff, group_w)].reshape(bB * Tp, group_w)
        dwout_rows = jax.lax.dot_general(  # [gw, W] = attn_gᵀ @ g
            a2, g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwqkv_cols = []
        dy_c = None
        for seg in range(3):
            col = pl.multiple_of(seg * W + poff, group_w)
            d2 = dqkv_s[:, :, pl.ds(col, group_w)].reshape(bB * Tp, group_w)
            dwqkv_cols.append(jax.lax.dot_general(  # [W, gw] = yᵀ @ dqkv_seg
                y2, d2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            contrib = jax.lax.dot_general(  # [R, W] = dqkv_seg @ w_segᵀ
                d2, wqkv_ref[:, pl.ds(col, group_w)],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dy_c = contrib if dy_c is None else dy_c + contrib
        return dwout_rows, dwqkv_cols, dy_c.reshape(bB, Tp, W)

    def dw_store(poff, dwout_rows, dwqkv_cols):
        """Write one group's dW slices (init on grid step 0, else add)."""
        @pl.when(i == 0)
        def _():
            dwout_ref[pl.ds(poff, group_w), :] = dwout_rows
            for seg in range(3):
                col = pl.multiple_of(seg * W + poff, group_w)
                dwqkv_ref[:, pl.ds(col, group_w)] = dwqkv_cols[seg]

        @pl.when(i > 0)
        def _():
            dwout_ref[pl.ds(poff, group_w), :] += dwout_rows
            for seg in range(3):
                col = pl.multiple_of(seg * W + poff, group_w)
                dwqkv_ref[:, pl.ds(col, group_w)] += dwqkv_cols[seg]

    def body(grp, carry):
        off = pl.multiple_of(grp * group_w, group_w)
        qg = proj_group(off)
        kg = proj_group(W + off)
        vg = proj_group(2 * W + off)
        gg = datt_group(off)
        if dw_interleave:
            # Previous group's dW/dy GEMMs — independent of this group's
            # chain, so the scheduler can overlap them with its VPU stages.
            @pl.when(grp > 0)
            def _():
                poff = pl.multiple_of((grp - 1) * group_w, group_w)
                dwout_rows, dwqkv_cols, dy_c = dw_group(poff)
                dw_store(poff, dwout_rows, dwqkv_cols)

                @pl.when(grp == 1)
                def _():
                    dy_s[:] = dy_c

                @pl.when(grp > 1)
                def _():
                    dy_s[:] += dy_c
        if pair_packed:
            o_g, dq_g, dk_g, dv_g = _pair_packed_attention_bwd(
                qg, kg, vg, gg, valid=valid, scale=scale, dt=dt
            )
            os_, dqs, dks, dvs = [o_g], [dq_g], [dk_g], [dv_g]
        elif stage_batched:
            os_, dqs, dks, dvs = stage_batched_heads(qg, kg, vg, gg)
        else:
            os_, dqs, dks, dvs = [], [], [], []
            for h in range(heads_per_group):
                sl = slice(h * Dh, (h + 1) * Dh)
                o, dq, dk, dv = one_head(
                    qg[:, :, sl], kg[:, :, sl], vg[:, :, sl], gg[:, :, sl]
                )
                os_.append(o)
                dqs.append(dq)
                dks.append(dk)
                dvs.append(dv)
        attn_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(os_, -1).astype(
            attn_s.dtype
        )
        dqkv_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(dqs, -1).astype(
            dqkv_s.dtype
        )
        dqkv_s[:, :, pl.ds(W + off, group_w)] = jnp.concatenate(dks, -1).astype(
            dqkv_s.dtype
        )
        dqkv_s[:, :, pl.ds(2 * W + off, group_w)] = jnp.concatenate(
            dvs, -1
        ).astype(dqkv_s.dtype)
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)

    # --- projection gradients ---
    if dw_interleave:
        # Groups 0..n-2 were handled inside the loop; finish the last one.
        last = pl.multiple_of((n_groups - 1) * group_w, group_w)
        dwout_rows, dwqkv_cols, dy_c = dw_group(last)
        dw_store(last, dwout_rows, dwqkv_cols)
        dy = dy_s[:] + dy_c
        dqkv2 = dqkv_s[:].reshape(bB * Tp, 3 * W)
    else:
        dwout_part = jax.lax.dot_general(  # [W, W] = attn_outᵀ @ g
            attn_s[:].reshape(bB * Tp, W), g2,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dqkv2 = dqkv_s[:].reshape(bB * Tp, 3 * W)
        dwqkv_part = jax.lax.dot_general(  # [W, 3W] = yᵀ @ dqkv
            y2, dqkv2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dy = jax.lax.dot_general(  # [R, W] = dqkv @ w_qkvᵀ
            dqkv2, wqkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bB, Tp, W)

    # --- LayerNorm backward (affine params + input) ---
    n3 = n
    dgamma_part = jnp.sum(dy * n3, axis=(0, 1), keepdims=True)[0]
    dbeta_part = jnp.sum(dy, axis=(0, 1), keepdims=True)[0]
    dn = dy * gamma_ref[0]
    dx_ln = rstd * (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - n3 * jnp.mean(dn * n3, axis=-1, keepdims=True)
    )
    dx_ref[:] = (g32 + dx_ln).astype(dx_ref.dtype)

    dbqkv_part = jnp.sum(dqkv2.astype(jnp.float32), axis=0, keepdims=True)
    dbout_part = jnp.sum(g2.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dgamma_ref[:] = dgamma_part
        dbeta_ref[:] = dbeta_part
        dbqkv_ref[:] = dbqkv_part
        dbout_ref[:] = dbout_part
        if not dw_interleave:  # else written slice-wise per group above
            dwqkv_ref[:] = dwqkv_part
            dwout_ref[:] = dwout_part

    @pl.when(i > 0)
    def _():
        dgamma_ref[:] += dgamma_part
        dbeta_ref[:] += dbeta_part
        dbqkv_ref[:] += dbqkv_part
        dbout_ref[:] += dbout_part
        if not dw_interleave:
            dwqkv_ref[:] += dwqkv_part
            dwout_ref[:] += dwout_part


_ATTN_BWD_VMEM_BUDGET = 56 * 2 ** 20

# Trace-time schedule switch for the dedicated backward (see
# stage_batched_heads in the kernel): False = per-head serial chain,
# True = per-stage over all heads in the group, None = auto (the measured
# rule below).  Module-level so the A/B harness (scripts/attn_bwd_ab.py)
# can compile both variants in one process.
_BWD_STAGE_BATCHED = None


def _bwd_stage_batched_wins(T: int, W: int, n_heads: int) -> bool:
    """Measured routing rule (scripts/attn_bwd_ab.py, fresh-inputs-per-rep
    harness, 2026-08-19): the stage-batched schedule beats the serial chain
    0.87-0.94x over 14 interleaved reps at ViT-B pretraining geometry
    (T=200 -> 256-lane score tile) and loses 1.03x at ViT-L (T=264 -> 384
    lanes).  Stage-batching keeps 2*heads_per_group+1 [Tp,Tp] score tiles
    live instead of 3, and the measured win survives only while the padded
    score tile stays within two 128-lane tiles; grads are bit-identical
    either way (pinned in tests/test_kernel_grads.py).  Causal (text-tower)
    geometry was not measured, so auto keeps it on the serial schedule —
    the rule only ever engages where the A/B showed a win."""
    return (W // n_heads) == 64 and -(-T // 128) * 128 <= 256


def _resolve_bwd_stage_batched(T: int, W: int, n_heads: int,
                               stage_batched=None, causal: bool = False) -> bool:
    if stage_batched is None:
        stage_batched = _BWD_STAGE_BATCHED
    if stage_batched is None:
        stage_batched = not causal and _bwd_stage_batched_wins(T, W, n_heads)
    return bool(stage_batched)


def _attn_block_bwd_fits(bB: int, Tp: int, W: int, n_heads: int = 0,
                         stage_batched: bool = False,
                         dw_interleave: bool = False,
                         pair_packed: bool = False) -> bool:
    """VMEM footprint of the dedicated backward: weights + f32 accumulators
    + the block tensors (x/g/dx bf16, n/datt/dy f32, attn/dqkv scratch) +
    live [Tp, Tp]-per-batch-row f32 score tiles (three on the serial
    schedule; the stage-batched schedule keeps p and dp live for every
    head in the group at once).  dw_interleave adds the [bB, Tp, W] f32
    dy accumulator scratch."""
    weights = 4 * W * W * 2 + 4 * W * W * 4  # wqkv+wout bf16, dwqkv+dwout f32
    tiles = 3
    if stage_batched and n_heads:
        heads_per_group = max(1, 128 // (W // n_heads))
        tiles = 2 * heads_per_group + 1
    if pair_packed:
        # [Tp, 2Tp] packed s/p/dp/ds tiles (~4 live x 2 Tp-widths) plus the
        # [2Tp, 128] Kbd/Vbd/dv/dk operands.
        tiles = max(tiles, 8)
    per_row = Tp * (3 * W * 2 + 3 * W * 4 + 4 * W * 2 + tiles * Tp * 4)
    if dw_interleave:
        per_row += Tp * W * 4  # dy accumulator scratch
    return weights + bB * per_row <= _ATTN_BWD_VMEM_BUDGET


# Trace-time switch for the dw-interleaved backward schedule (see
# _attn_block_bwd_kernel's dw_interleave doc): None = auto, True/False =
# force.  Auto is always False — the schedule MEASURED SLOWER than the
# stage-batched default at every probed config (3.36-3.64 vs 3.15 ms,
# scripts/attn_bwd_ab.py 2026-08-20); it stays in-tree as the VERDICT #4
# falsification record, numerics-pinned but never routed.
_BWD_DW_INTERLEAVE = None


def _resolve_bwd_dw_interleave(n_heads: int, W: int,
                               dw_interleave=None) -> bool:
    if dw_interleave is None:
        dw_interleave = _BWD_DW_INTERLEAVE
    if dw_interleave is None:
        dw_interleave = False  # measured to lose everywhere probed
    heads_per_group = max(1, 128 // max(1, W // n_heads))
    n_groups = max(1, n_heads // heads_per_group)
    return bool(dw_interleave) and n_groups >= 2


# Trace-time switch for the pair-packed backward chain (the round-4 forward
# pack applied to the softmax-attention gradient): None = auto (the measured
# rule in _resolve_bwd_pair_packed), True/False = force.
_BWD_PAIR_PACKED = None


def _resolve_bwd_pair_packed(T: int, W: int, n_heads: int,
                             pair_packed=None, causal: bool = False) -> bool:
    """MEASURED NEUTRAL — auto stays OFF.  The forward pack's 0.833x win at
    T=264 does NOT transfer to the backward chain (A/B
    `scripts/attn_bwd_ab.py vitl 64 5 pack`, 2026-08-20: packed 3.81 vs
    serial 3.85 ms — noise).  Only s/dp/o share the forward's lane-round-up
    structure; dv/dq/dk are tile-arithmetic washes, and the W-GEMM majority
    of the kernel was never affected.  See docs/PERF.md round-5.  Non-causal
    Dh=64 pairs only; forceable for the A/B and the numerics pin."""
    if pair_packed is None:
        pair_packed = _BWD_PAIR_PACKED
    if pair_packed is None:
        pair_packed = False  # measured neutral at its only candidate geometry
    hpg = max(1, 128 // max(1, W // n_heads))
    return bool(pair_packed) and hpg == 2 and not causal


def _attn_block_bwd_impl(
    x, gamma, beta, w_qkv, b_qkv, w_out, g, n_heads, valid, eps, block_b,
    interpret, causal=False, stage_batched=None, dw_interleave=None,
    pair_packed=None,
):
    from jax.experimental.pallas import tpu as pltpu_local

    B, Tp, W = x.shape
    pair_packed = _resolve_bwd_pair_packed(
        Tp, W, n_heads, pair_packed, causal)
    stage_batched = not pair_packed and _resolve_bwd_stage_batched(
        Tp, W, n_heads, stage_batched, causal)
    dw_interleave = _resolve_bwd_dw_interleave(n_heads, W, dw_interleave)
    dtype = x.dtype
    bB = min(block_b, B)
    while bB > 1 and (
        B % bB or not _attn_block_bwd_fits(bB, Tp, W, n_heads, stage_batched,
                                           dw_interleave, pair_packed)
    ):
        bB -= 1
    while B % bB:
        bB -= 1

    outs = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_kernel, n_heads=n_heads, valid=valid, eps=eps,
            causal=causal, stage_batched=stage_batched,
            dw_interleave=dw_interleave, pair_packed=pair_packed,
        ),
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, Tp, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((bB, Tp, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bB, Tp, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, W), dtype),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((W, 3 * W), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * W), jnp.float32),
            jax.ShapeDtypeStruct((W, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu_local.VMEM((bB, Tp, W), dtype),
            pltpu_local.VMEM((bB, Tp, 3 * W), dtype),
        ] + ([pltpu_local.VMEM((bB, Tp, W), jnp.float32)]
             if dw_interleave else []),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * B * Tp * W * 4 * W) + 5 * 2 * B * n_heads * Tp * Tp * (W // n_heads),
            bytes_accessed=3 * B * Tp * W * dtype.itemsize + 8 * W * W * 4,
            transcendentals=B * n_heads * Tp * Tp,
        ),
        compiler_params=pltpu_local.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20
        ),
        interpret=interpret,
    )(
        x,
        g,
        gamma.astype(jnp.float32).reshape(1, W),
        beta.astype(jnp.float32).reshape(1, W),
        w_qkv.astype(dtype),
        b_qkv.astype(jnp.float32).reshape(1, 3 * W),
        w_out.astype(dtype),
    )
    dx, dgamma, dbeta, dwqkv, dbqkv, dwout, dbout = jax.lax.optimization_barrier(
        outs
    )
    return dx, dgamma, dbeta, dwqkv, dbqkv, dwout, dbout


def _attn_block_xla(x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, causal=False):
    from tapclip_tpu.models import layers

    p_ln = {"scale": gamma, "bias": beta}
    p_attn = {"w_qkv": w_qkv, "b_qkv": b_qkv, "w_out": w_out, "b_out": b_out}
    T = x.shape[1]
    kv = None if valid == T else valid
    h, _ = layers.attn_forward(
        layers.layer_norm(x, p_ln, eps), p_attn, n_heads, kv_valid_len=kv,
        impl="xla", causal=causal,
    )
    return x + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _attn_block_vjp(x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, block_b, interpret, causal):
    return _attn_block_fwd_impl(
        x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, block_b, interpret, causal
    )


def _attn_block_fwd(x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, block_b, interpret, causal):
    out = _attn_block_vjp(
        x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, block_b, interpret, causal
    )
    return out, (x, gamma, beta, w_qkv, b_qkv, w_out, b_out)


def _attn_block_split(x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, causal=False):
    """LN -> QKV GEMM -> fused_mha kernel -> out-proj GEMM -> +residual.

    The gradient path for the monolithic forward kernel: XLA handles the
    GEMM/LN pieces (its weight-grad GEMMs are already optimal and it saves
    their activations), while the attention core runs the Pallas forward and
    its dedicated Pallas backward — no [B, H, T, T] HBM round trip in either
    direction.
    """
    from tapclip_tpu.models import layers

    y = layers.layer_norm(x, {"scale": gamma, "bias": beta}, eps)
    qkv = layers.dense(y, w_qkv, b_qkv)
    out = fused_mha(qkv, n_heads, valid_len=valid, causal=causal)
    return x + layers.dense(out, w_out, b_out)


def _attn_block_bwd(n_heads, valid, eps, block_b, interpret, causal, res, g):
    x, gamma, beta, w_qkv, b_qkv, w_out, b_out = res
    B, T, W = x.shape
    Dh = W // n_heads
    heads_per_group = max(1, 128 // Dh)
    # Mirror _attn_block_bwd_impl's schedule resolution exactly (incl. the
    # A/B force switches) so the fits check gates the footprint the kernel
    # will actually run with — a forced pair_packed/dw_interleave schedule
    # must not slip past a budget computed for the default schedule.
    packed = _resolve_bwd_pair_packed(T, W, n_heads, causal=causal)
    staged = not packed and _resolve_bwd_stage_batched(
        T, W, n_heads, causal=causal)
    dw = _resolve_bwd_dw_interleave(n_heads, W)
    use_kernel = (
        _HAS_PLTPU
        and n_heads % heads_per_group == 0
        and W % 128 == 0
        and T % 8 == 0
        and _attn_block_bwd_fits(1, T, W, n_heads, staged, dw, packed)
    )
    if use_kernel:
        dx, dgamma, dbeta, dwqkv, dbqkv, dwout, dbout = _attn_block_bwd_impl(
            x, gamma, beta, w_qkv, b_qkv, w_out, g, n_heads, valid, eps,
            block_b, interpret, causal,
        )
        return (
            dx,
            dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dbeta.reshape(beta.shape).astype(beta.dtype),
            dwqkv.astype(w_qkv.dtype),
            dbqkv.reshape(b_qkv.shape).astype(b_qkv.dtype),
            dwout.astype(w_out.dtype),
            dbout.reshape(b_out.shape).astype(b_out.dtype),
        )
    # Fallback: differentiate through the split composition (XLA GEMMs +
    # the fused_mha core's dedicated backward).
    _, vjp = jax.vjp(
        lambda *a: _attn_block_split(*a, n_heads, valid, eps, causal),
        x, gamma, beta, w_qkv, b_qkv, w_out, b_out,
    )
    return vjp(g)


_attn_block_vjp.defvjp(_attn_block_fwd, _attn_block_bwd)


def fused_attn_block(
    x: jnp.ndarray,  # [B, T, W], T a multiple of 8
    ln_params,
    attn_params,
    n_heads: int,
    *,
    valid_len: Optional[int] = None,
    eps: float = 1e-5,
    block_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """``x + out_proj(mha(qkv_proj(layer_norm(x))))`` in one kernel."""
    B, T, W = x.shape
    Dh = W // n_heads
    heads_per_group = max(1, 128 // Dh)
    valid = valid_len if valid_len is not None else T
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # bb=8 measured best end-to-end at ViT-B width (the VMEM-fit picker
        # steps it down to 4 at ViT-L width, which beats forcing 2 or 8).
        block_b = 8
    if n_heads % heads_per_group or W % 128 or T % 8:
        return _attn_block_xla(
            x, ln_params["scale"], ln_params["bias"],
            attn_params["w_qkv"], attn_params["b_qkv"],
            attn_params["w_out"], attn_params["b_out"], n_heads, valid, eps,
            causal,
        )
    block_b = _pick_attn_block_b(
        B, T, W, block_b,
        pair_packed=_resolve_pair_packed(T, W, n_heads, causal),
    )
    return _attn_block_vjp(
        x, ln_params["scale"], ln_params["bias"],
        attn_params["w_qkv"], attn_params["b_qkv"],
        attn_params["w_out"], attn_params["b_out"],
        n_heads, valid, eps, block_b, interpret, causal,
    )


_ATTN_VMEM_LIMIT = 64 * 2 ** 20  # raised Mosaic scoped-VMEM cap (v5e has 128M)

# Trace-time switch for the forward score/output GEMM packing (see
# pair_packed_group in the kernel): None = auto (the lane round-up rule
# below), False = per-head always, True = pack whenever legal.
# Module-level so the A/B harness (scripts/head_pack_ab.py) can compile
# both variants in one process.
_FWD_PAIR_PACKED = None


def _pair_pack_wins(T: int) -> bool:
    """Lane round-up routing rule, pinned by the chip A/B
    (scripts/head_pack_ab.py): packing both Dh=64 heads pays only when the
    doubled lane axis rounds up to LESS than two per-head round-ups —
    measured 0.833x (1.21->1.01 ms, 67.2->80.6% MXU, both arms exactly at
    their lane-round-up ceilings; hardened fresh-inputs-per-rep harness,
    docs/PERF.md round-4) at ViT-L/14 224px (T=264: 640 < 2*384) and a
    wash (1.010x over 9 reps) at ViT-B/16 (T=200: 512 = 2*256).  The
    K=64->128 depth doubling alone measured free on v5e, so geometry where
    only the depth changes routes to the per-head schedule."""
    r = -(-T // 128) * 128
    r2 = -(-(2 * T) // 128) * 128
    return r2 < 2 * r


def _resolve_pair_packed(T: int, W: int, n_heads: int, causal: bool,
                         pair_packed=None) -> bool:
    """One routing decision shared by the VMEM picker and the kernel trace —
    the picker must budget the schedule that will actually run."""
    if pair_packed is None:
        pair_packed = _FWD_PAIR_PACKED
    if pair_packed is None:  # auto: the measured lane round-up rule
        pair_packed = _pair_pack_wins(T)
    # The pair packing needs exactly two Dh=64 heads per 128-lane group and a
    # segment-uniform key mask (non-causal).
    return bool(pair_packed) and not causal and (W // n_heads) == 64


def _pick_attn_block_b(B: int, T: int, W: int, preferred: int,
                       budget: int = 48 * 2 ** 20,
                       pair_packed: bool = False) -> int:
    """Largest batch block whose VMEM footprint fits the budget.

    The kernel no longer materializes a [bB, T, 3W] qkv scratch (projections
    are computed per head-group), so the footprint is weights (4W^2 bf16) +
    double-buffered x/out + attn scratch + f32 LN copy + y + per-group
    slices + two [T, T]-ish f32 score tiles per batch row.  The pair-packed
    schedule doubles the live score tiles to [T, 2T] (s and p) and adds the
    block-diagonal kbd f32 / vbd bf16 operands — budgeted explicitly so a
    geometry that just fits per-head cannot compile the packed schedule into
    a scoped-allocation failure.  The budget sits under the raised
    ``_ATTN_VMEM_LIMIT`` (the 16M Mosaic default was the binding constraint
    on v5e, not physical VMEM).
    """
    weights = (3 * W * W + W * W) * 2
    score = 16 if pair_packed else 8
    extra = 1536 if pair_packed else 0  # kbd [2T,128] f32 + vbd [2T,128] bf16
    per_row = T * (14 * W + score * T + 1536 + extra)
    if pair_packed:
        # The packed schedule's extra live tensors are modeled explicitly
        # above, so its budget is the raised Mosaic cap minus double-buffer
        # headroom rather than the blanket-conservative 48M: the proven
        # ViT-L/14 224px packed config (bb=8, ~54M modeled) compiles and
        # runs at 971 img/s under the 64M cap.
        budget = max(budget, _ATTN_VMEM_LIMIT - 8 * 2 ** 20)
    for bb in (preferred, 8, 4, 2, 1):
        if bb > B or B % bb or bb > preferred:
            continue
        if weights + bb * per_row <= budget:
            return bb
    return 1


def _attn_block_fwd_impl(x, gamma, beta, w_qkv, b_qkv, w_out, b_out, n_heads, valid, eps, block_b, interpret, causal=False, pair_packed=None):
    from jax.experimental.pallas import tpu as pltpu_local

    B, T, W = x.shape
    dtype = x.dtype
    pair_packed = _resolve_pair_packed(T, W, n_heads, causal, pair_packed)
    bB = min(block_b, B)
    while B % bB:
        bB -= 1
    kernel = functools.partial(
        _attn_block_kernel, n_heads=n_heads, valid=valid, eps=eps, causal=causal,
        pair_packed=pair_packed,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, W), dtype),
        scratch_shapes=[
            pltpu_local.VMEM((bB, T, W), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * (3 * W + W) + 2 * 2 * B * n_heads * T * T * (W // n_heads),
            bytes_accessed=2 * B * T * W * dtype.itemsize + 4 * W * W * 2,
            transcendentals=B * n_heads * T * T,
        ),
        compiler_params=pltpu_local.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        x,
        gamma.astype(jnp.float32).reshape(1, W),
        beta.astype(jnp.float32).reshape(1, W),
        w_qkv.astype(dtype),
        b_qkv.astype(jnp.float32).reshape(1, 3 * W),
        w_out.astype(dtype),
        b_out.astype(jnp.float32).reshape(1, W),
    )
