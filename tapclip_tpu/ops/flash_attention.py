"""Fused TPU attention kernel (Pallas) with attribution aux output.

This is the TPU-native replacement for the reference's forward-hook machinery
(``/root/reference/models/clip_wrapper.py:29-40``): instead of materializing
the full ``[B, H, T, T]`` attention map on the host, the kernel optionally
emits the single probability *column* ``P[b, h, :, eot_idx[b]]`` that the
attribution monitor consumes (``/root/reference/models/attribution_monitor.py:26-29``),
head-averaged by the wrapper — a ``[B, T]`` array instead of ``[B, H, T, T]``.

Design notes (TPU-first):
  * CLIP sequences are short (50/82/197/257 tokens), so one program handles a
    full ``[T, T]`` score tile per (batch, head) — numerically-stable softmax
    without the online-softmax bookkeeping flash attention needs for long
    sequences.  The scores tile lives entirely in VMEM (T<=1024 -> <=4MB f32).
  * Q/K/V matmuls hit the MXU via ``jax.lax.dot_general`` with f32
    accumulation; inputs may be bf16.
  * Per-batch scalars (valid key length, attribution column index) ride in as
    scalar-prefetch operands in SMEM so one compiled kernel serves every
    class-prompt length.
  * Backward: ``jax.custom_vjp`` with dedicated Pallas backward kernels.
    Short sequences (padded T <= 2048) use the single-block kernel
    (``_attn_bwd_kernel``), which recomputes the score tile from the saved
    q/k/v and emits dq/dk/dv in one program.  Past the cap, the blockwise
    FlashAttention-2-style scheme runs: an LSE recompute kernel
    (``_blocked_lse_kernel``), a dK/dV kernel looping over query blocks
    (``_blocked_bwd_dkv_kernel``), and a dQ kernel looping over key blocks
    (``_blocked_bwd_dq_kernel``) — memory stays O(T·Dh + Qb·KVb) end to
    end, so training never escapes to XLA at any sequence length.  The aux
    (attribution) output is consumed under ``stop_gradient`` (the reference
    detaches it), so its cotangent is structurally zero.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised only on TPU-capable installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from tapclip_tpu.ops.attention import attention_reference

_LANE = 128
_MAX_SINGLE_BLOCK_T = 2048
_Q_BLOCK = 512
_KV_BLOCK = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_LOG2E = 1.4426950408889634


def _attn_kernel(
    valid_ref,  # SMEM [B] int32 — number of valid keys per batch row
    eot_ref,  # SMEM [B] int32 — attribution column index per batch row
    q_ref,  # VMEM [1, 1, Tp, Dh]
    k_ref,
    v_ref,
    o_ref,  # VMEM [1, 1, Tp, Dh]
    aux_ref,  # VMEM [1, H, Tp] f32 or None (when with_aux=False); the block
    # is revisited across the head grid dim — program h writes row h.
    *,
    scale: float,
    causal: bool,
    with_aux: bool,
):
    b = pl.program_id(0)
    valid = valid_ref[b]

    q = q_ref[0, 0].astype(jnp.float32)  # [Tp, Dh]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    Tp = q.shape[0]

    # [Tp, Tp] scores on the MXU, f32 accumulate.
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # exp2 softmax: scale·log2(e) folded into one multiply; normalisation by
    # 1/l deferred past the p·v dot ([Tp, Dh] divide instead of [Tp, Tp]).
    s = s * (scale * _LOG2E)

    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        mask = jnp.logical_and(mask, ki <= qi)
    neg = jnp.float32(-1e30)
    s = jnp.where(mask, s, neg)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    o_ref[0, 0] = (
        jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        / l
    ).astype(o_ref.dtype)

    if with_aux:
        # Extract column eot_idx of the normalized probabilities: the
        # attention each query position pays to the EOT/last position.
        eot = eot_ref[b]
        onehot = (ki == eot).astype(jnp.float32)  # [Tp, Tp] column mask
        h = pl.program_id(1)
        aux_ref[0, h, :] = jnp.sum(p * onehot, axis=-1) / l[:, 0]


def _blocked_attn_kernel(
    valid_ref,  # SMEM [B]
    eot_ref,  # SMEM [B]
    q_ref,  # VMEM [1, 1, Qb, Dh] — one query block
    k_ref,  # VMEM [1, 1, Tp, Dh] — full keys for this (b, h)
    v_ref,  # VMEM [1, 1, Tp, Dh]
    o_ref,  # VMEM [1, 1, Qb, Dh]
    aux_ref,  # VMEM [1, H, Tp] or None — revisited block; program (b,h,qb)
    # writes row h, columns [qb*Qb, (qb+1)*Qb)
    *,
    scale: float,
    causal: bool,
    with_aux: bool,
    q_block: int,
    kv_block: int,
):
    """Online-softmax flash attention: KV processed in chunks.

    Keys/values stay resident in VMEM (fine to ~16k tokens bf16); only the
    [Qb, KVb] score tile is materialized per step, so memory is O(T·Dh +
    Qb·KVb) instead of O(T²).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi_blk = pl.program_id(2)
    valid = valid_ref[b]

    # scale·log2(e) folded into the query pre-multiply; all running-softmax
    # exponentials below are then exp2 in the log2 domain.
    q = q_ref[0, 0].astype(jnp.float32) * (scale * _LOG2E)  # [Qb, Dh]
    Tp = k_ref.shape[2]
    Qb = q.shape[0]
    n_kv = Tp // kv_block
    q_start = qi_blk * q_block

    neg = jnp.float32(-1e30)
    m0 = jnp.full((Qb, 1), neg, jnp.float32)
    l0 = jnp.zeros((Qb, 1), jnp.float32)
    acc0 = jnp.zeros((Qb, q_ref.shape[3]), jnp.float32)

    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (Qb, kv_block), 0)

    def body(i, carry):
        m, l, acc = carry
        k_chunk = k_ref[0, 0, pl.ds(i * kv_block, kv_block), :].astype(jnp.float32)
        v_chunk = v_ref[0, 0, pl.ds(i * kv_block, kv_block), :]
        s = jax.lax.dot_general(
            q, k_chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Qb, KVb]
        k_ids = i * kv_block + jax.lax.broadcasted_iota(
            jnp.int32, (Qb, kv_block), 1
        )
        mask = k_ids < valid
        if causal:
            mask = jnp.logical_and(mask, k_ids <= q_ids)
        s = jnp.where(mask, s, neg)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_chunk.dtype),
            v_chunk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)

    if with_aux:
        # attention of each query in this block to key position eot:
        # exp(q . k_eot - m) / l  (k_eot row fetched once).
        eot = eot_ref[b]
        k_eot = k_ref[0, 0, pl.ds(eot, 1), :].astype(jnp.float32)  # [1, Dh]
        s_eot = jax.lax.dot_general(
            q, k_eot, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Qb, 1]
        col = jnp.exp2(s_eot - m) / l_safe  # [Qb, 1]
        # The loop masked invalid/causal-excluded keys out of (m, l); the
        # recomputed eot score must honor the same mask explicitly.
        q_rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Qb, 1), 0)
        ok = jnp.full((Qb, 1), eot < valid)
        if causal:
            ok = jnp.logical_and(ok, eot <= q_rows)
        col = jnp.where(ok, col, 0.0)
        aux_ref[0, h, pl.ds(q_start, Qb)] = col[:, 0]


def _pallas_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,  # [B] int32
    eot: jnp.ndarray,  # [B] int32
    *,
    causal: bool,
    with_aux: bool,
    interpret: bool = False,
    force_blocked: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    B, H, T, Dh = q.shape
    Tp = _round_up(max(T, 8), _LANE)
    if Tp > _MAX_SINGLE_BLOCK_T or force_blocked:
        return _pallas_attention_blocked(
            q, k, v, valid, eot, causal=causal, with_aux=with_aux, interpret=interpret
        )
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    kernel = functools.partial(
        _attn_kernel, scale=Dh ** -0.5, causal=causal, with_aux=with_aux
    )

    out_shapes = [jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, *_: (b, h, 0, 0)),
    ]
    if with_aux:
        # Full-H block revisited across the h grid dim (TPU tiling requires
        # the 2nd-to-last block dim be 8-divisible or equal the array dim).
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Tp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, H, Tp), lambda b, h, *_: (b, 0, 0)))
    else:
        kernel = functools.partial(_no_aux_adapter, kernel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, *_: (b, h, 0, 0)),
        ],
        out_specs=tuple(out_specs),
    )

    flops = 2 * 2 * B * H * Tp * Tp * Dh
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 * B * H * Tp * Dh + B * H * Tp * Dh) * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), eot.astype(jnp.int32), qp, kp, vp)

    out = results[0][:, :, :T, :]
    aux = None
    if with_aux:
        # Head-average (clip_wrapper.py:36 "mean over heads"), drop padding.
        aux = results[1][:, :, :T].mean(axis=1)
    return out, aux


def _no_aux_adapter(kernel, valid_ref, eot_ref, q_ref, k_ref, v_ref, o_ref):
    kernel(valid_ref, eot_ref, q_ref, k_ref, v_ref, o_ref, None)


def _pallas_attention_blocked(
    q, k, v, valid, eot, *, causal, with_aux, interpret=False
):
    """Blockwise (online-softmax) path for sequences past the single-block cap."""
    B, H, T, Dh = q.shape
    kv_block = _KV_BLOCK
    q_block = min(_Q_BLOCK, _round_up(max(T, 8), _LANE))
    Tp = _round_up(max(T, 8), max(q_block, kv_block))
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    n_q = Tp // q_block

    kernel = functools.partial(
        _blocked_attn_kernel,
        scale=Dh ** -0.5,
        causal=causal,
        with_aux=with_aux,
        q_block=q_block,
        kv_block=kv_block,
    )
    out_shapes = [jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, q_block, Dh), lambda b, h, qb, *_: (b, h, qb, 0)),
    ]
    if with_aux:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Tp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, H, Tp), lambda b, h, qb, *_: (b, 0, 0)))
    else:
        kernel = functools.partial(_no_aux_adapter, kernel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, Dh), lambda b, h, qb, *_: (b, h, qb, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, qb, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, qb, *_: (b, h, 0, 0)),
        ],
        out_specs=tuple(out_specs),
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tp * Tp * Dh,
            bytes_accessed=4 * B * H * Tp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), eot.astype(jnp.int32), qp, kp, vp)

    out = results[0][:, :, :T, :]
    aux = results[1][:, :, :T].mean(axis=1) if with_aux else None
    return out, aux


def _attn_bwd_kernel(
    valid_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, 1, Tp, Dh]
    k_ref,
    v_ref,
    g_ref,  # VMEM [1, 1, Tp, Dh] — cotangent of the attention output
    dq_ref,  # VMEM [1, 1, Tp, Dh]
    dk_ref,
    dv_ref,
    *,
    scale: float,
    causal: bool,
):
    """Single-block attention backward (per batch-head program).

    Recomputes ``p = softmax(mask(q kᵀ · scale))`` from the saved inputs, then
    the standard softmax-attention gradient: dv = pᵀ g, dp = g vᵀ,
    ds = p ⊙ (dp − rowsum(dp ⊙ p)) · scale, dq = ds k, dk = dsᵀ q.
    Masked keys have p = 0 exactly (−1e30 fill), so ds vanishes there; padded
    query rows carry zero cotangent from the caller's padding.

    The attribution aux output is consumed under ``stop_gradient`` in the
    model (the reference detaches it, clip_wrapper.py:36), so its cotangent
    is structurally zero and never enters this kernel.
    """
    b = pl.program_id(0)
    valid = valid_ref[b]

    q = q_ref[0, 0].astype(jnp.float32)  # [Tp, Dh]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    Tp = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    mask = ki < valid
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
        mask = jnp.logical_and(mask, ki <= qi)
    s = jnp.where(mask, s * (scale * _LOG2E), jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Tq, Tk]

    dv = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tk, Dh]
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tq, Tk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pallas_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,  # [B, H, T, Dh] cotangent of the output
    valid: jnp.ndarray,  # [B] int32
    *,
    causal: bool,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, H, T, Dh = q.shape
    Tp = _round_up(max(T, 8), _LANE)
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
    qp, kp, vp, gp = (jnp.pad(t, pad) for t in (q, k, v, g))

    kernel = functools.partial(_attn_bwd_kernel, scale=Dh ** -0.5, causal=causal)
    spec = pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, *_: (b, h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
    )
    shape = jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * Tp * Tp * Dh,
            bytes_accessed=7 * B * H * Tp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), qp, kp, vp, gp)
    return dq[:, :, :T], dk[:, :, :T], dv[:, :, :T]


# ---------------------------------------------------------------------------
# Blockwise backward (FlashAttention-2 scheme) for the long-sequence path
# ---------------------------------------------------------------------------


def _blocked_lse_kernel(
    valid_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, 1, Qb, Dh]
    k_ref,  # VMEM [1, 1, Tp, Dh] — full keys for this (b, h)
    lse_ref,  # VMEM [1, H, Tp] f32, revisited block; program (b,h,qb) writes
    # row h, columns [qb*Qb, (qb+1)*Qb)
    *,
    scale: float,
    causal: bool,
    q_block: int,
    kv_block: int,
):
    """Recompute the log2-domain row logsumexp the forward normalized with.

    ``lse2[i] = m2[i] + log2(l[i])`` where ``m2/l`` are the forward's online
    max/sum over masked ``s2 = (q·kᵀ)·scale·log2(e)`` — so the backward's
    ``p = exp2(s2 - lse2)`` reproduces the forward's probabilities exactly.
    One extra q·kᵀ sweep (~1/5 of the backward's FLOPs) instead of saving
    the [B, H, Tp] tensor from the forward.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi_blk = pl.program_id(2)
    valid = valid_ref[b]

    q = q_ref[0, 0].astype(jnp.float32) * (scale * _LOG2E)  # [Qb, Dh]
    Tp = k_ref.shape[2]
    Qb = q.shape[0]
    n_kv = Tp // kv_block
    q_start = qi_blk * q_block
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (Qb, kv_block), 0)

    neg = jnp.float32(-1e30)
    m0 = jnp.full((Qb, 1), neg, jnp.float32)
    l0 = jnp.zeros((Qb, 1), jnp.float32)

    def body(i, carry):
        m, l = carry
        k_chunk = k_ref[0, 0, pl.ds(i * kv_block, kv_block), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_ids = i * kv_block + jax.lax.broadcasted_iota(
            jnp.int32, (Qb, kv_block), 1
        )
        mask = k_ids < valid
        if causal:
            mask = jnp.logical_and(mask, k_ids <= q_ids)
        s = jnp.where(mask, s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        l_new = l * jnp.exp2(m - m_new) + jnp.sum(
            jnp.exp2(s - m_new), axis=-1, keepdims=True
        )
        return m_new, l_new

    m, l = jax.lax.fori_loop(0, n_kv, body, (m0, l0))
    lse = m + jnp.log2(jnp.maximum(l, 1e-30))
    lse_ref[0, h, pl.ds(q_start, Qb)] = lse[:, 0]


def _blocked_bwd_dkv_kernel(
    valid_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, 1, Tp, Dh] — full queries for this (b, h)
    do_ref,  # VMEM [1, 1, Tp, Dh] — full output cotangent
    k_ref,  # VMEM [1, 1, KVb, Dh] — this program's key block
    v_ref,  # VMEM [1, 1, KVb, Dh]
    lse_ref,  # VMEM [1, H, Tp] f32
    delta_ref,  # VMEM [1, H, Tp] f32 — rowsum(dO ∘ O)
    dk_ref,  # VMEM [1, 1, KVb, Dh]
    dv_ref,
    *,
    scale: float,
    causal: bool,
    q_block: int,
    kv_block: int,
):
    """dK/dV for one key block: loop over query blocks, f32 accumulators.

    Padded/invalid query rows need no mask: their cotangent (and delta) are
    zero-padded by the caller, so p·(dp − delta) vanishes row-wise.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    jb = pl.program_id(2)
    valid = valid_ref[b]

    k = k_ref[0, 0].astype(jnp.float32)  # [KVb, Dh]
    v = v_ref[0, 0].astype(jnp.float32)
    Tp = q_ref.shape[2]
    Dh = k.shape[1]
    n_q = Tp // q_block
    k_start = jb * kv_block
    k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, kv_block), 1)

    def body(i, carry):
        dk, dv = carry
        q_i = q_ref[0, 0, pl.ds(i * q_block, q_block), :].astype(jnp.float32)
        do_i = do_ref[0, 0, pl.ds(i * q_block, q_block), :].astype(jnp.float32)
        lse_i = lse_ref[0, h, pl.ds(i * q_block, q_block)][:, None]
        delta_i = delta_ref[0, h, pl.ds(i * q_block, q_block)][:, None]
        s2 = jax.lax.dot_general(
            q_i, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        mask = k_ids < valid
        if causal:
            q_ids = i * q_block + jax.lax.broadcasted_iota(
                jnp.int32, (q_block, kv_block), 0
            )
            mask = jnp.logical_and(mask, k_ids <= q_ids)
        p = jnp.where(mask, jnp.exp2(s2 - lse_i), 0.0)  # [Qb, KVb]
        dv = dv + jax.lax.dot_general(
            p, do_i, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_i, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_i) * scale
        dk = dk + jax.lax.dot_general(
            ds, q_i, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    z = jnp.zeros((kv_block, Dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (z, z))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _blocked_bwd_dq_kernel(
    valid_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, 1, Qb, Dh] — this program's query block
    do_ref,  # VMEM [1, 1, Qb, Dh]
    k_ref,  # VMEM [1, 1, Tp, Dh] — full keys
    v_ref,  # VMEM [1, 1, Tp, Dh]
    lse_ref,  # VMEM [1, H, Tp] f32
    delta_ref,  # VMEM [1, H, Tp] f32
    dq_ref,  # VMEM [1, 1, Qb, Dh]
    *,
    scale: float,
    causal: bool,
    q_block: int,
    kv_block: int,
):
    """dQ for one query block: loop over key blocks, f32 accumulator."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi_blk = pl.program_id(2)
    valid = valid_ref[b]

    q = q_ref[0, 0].astype(jnp.float32)  # [Qb, Dh]
    do = do_ref[0, 0].astype(jnp.float32)
    Tp = k_ref.shape[2]
    Qb, Dh = q.shape
    n_kv = Tp // kv_block
    q_start = qi_blk * q_block
    lse_i = lse_ref[0, h, pl.ds(q_start, Qb)][:, None]
    delta_i = delta_ref[0, h, pl.ds(q_start, Qb)][:, None]
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (Qb, kv_block), 0)

    def body(j, dq):
        k_chunk = k_ref[0, 0, pl.ds(j * kv_block, kv_block), :].astype(jnp.float32)
        v_chunk = v_ref[0, 0, pl.ds(j * kv_block, kv_block), :].astype(jnp.float32)
        s2 = jax.lax.dot_general(
            q, k_chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        k_ids = j * kv_block + jax.lax.broadcasted_iota(
            jnp.int32, (Qb, kv_block), 1
        )
        mask = k_ids < valid
        if causal:
            mask = jnp.logical_and(mask, k_ids <= q_ids)
        p = jnp.where(mask, jnp.exp2(s2 - lse_i), 0.0)
        dp = jax.lax.dot_general(
            do, v_chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_i) * scale
        return dq + jax.lax.dot_general(
            ds, k_chunk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, n_kv, body, jnp.zeros((Qb, Dh), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _pallas_attention_bwd_blocked(
    q: jnp.ndarray,  # [B, H, T, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,  # [B, H, T, Dh] cotangent of the output
    out: jnp.ndarray,  # [B, H, T, Dh] saved forward output (for delta)
    valid: jnp.ndarray,  # [B] int32
    *,
    causal: bool,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blockwise attention backward past the single-block cap.

    Three Pallas dispatches (LSE recompute, dK/dV, dQ); ``delta =
    rowsum(dO ∘ O)`` is one cheap memory-bound XLA pass.
    """
    B, H, T, Dh = q.shape
    kv_block = _KV_BLOCK
    q_block = min(_Q_BLOCK, _round_up(max(T, 8), _LANE))
    Tp = _round_up(max(T, 8), max(q_block, kv_block))
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
    qp, kp, vp, gp = (jnp.pad(t, pad) for t in (q, k, v, g))
    n_q = Tp // q_block
    n_kv = Tp // kv_block
    scale = Dh ** -0.5
    valid = valid.astype(jnp.int32)

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, H, T]
    delta = jnp.pad(delta, [(0, 0), (0, 0), (0, Tp - T)])

    kw = dict(scale=scale, causal=causal, q_block=q_block, kv_block=kv_block)
    qspec = pl.BlockSpec((1, 1, q_block, Dh), lambda b, h, i, *_: (b, h, i, 0))
    full = pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, i, *_: (b, h, 0, 0))
    rows = pl.BlockSpec((1, H, Tp), lambda b, h, i, *_: (b, 0, 0))
    kvspec = pl.BlockSpec((1, 1, kv_block, Dh), lambda b, h, j, *_: (b, h, j, 0))

    lse = pl.pallas_call(
        functools.partial(_blocked_lse_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_q),
            in_specs=[qspec, full],
            out_specs=rows,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * Tp * Dh,
            bytes_accessed=2 * B * H * Tp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid, qp, kp)

    shape_kv = jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype)
    dk, dv = pl.pallas_call(
        functools.partial(_blocked_bwd_dkv_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_kv),
            in_specs=[full, full, kvspec, kvspec, rows, rows],
            out_specs=(kvspec, kvspec),
        ),
        out_shape=(shape_kv, shape_kv),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * H * Tp * Tp * Dh,
            bytes_accessed=6 * B * H * Tp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid, qp, gp, kp, vp, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_blocked_bwd_dq_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_q),
            in_specs=[qspec, qspec, full, full, rows, rows],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tp * Tp * Dh,
            bytes_accessed=5 * B * H * Tp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(valid, qp, gp, kp, vp, lse, delta)

    return dq[:, :, :T], dk[:, :, :T], dv[:, :, :T]


# ---------------------------------------------------------------------------
# Differentiable public entry point
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7)
)
def _fused_attention_core(q, k, v, valid, eot, causal, with_aux, interpret):
    out, aux = _pallas_attention(
        q, k, v, valid, eot, causal=causal, with_aux=with_aux, interpret=interpret
    )
    if aux is None:
        aux = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
    return out, aux


def _core_fwd(q, k, v, valid, eot, causal, with_aux, interpret):
    res = _fused_attention_core(q, k, v, valid, eot, causal, with_aux, interpret)
    # The blocked backward needs the forward output (delta = rowsum(dO ∘ O));
    # saving it costs nothing there (it is live anyway) and is skipped on the
    # single-block path.
    blocked = _round_up(max(q.shape[2], 8), _LANE) > _MAX_SINGLE_BLOCK_T
    return res, (q, k, v, valid, eot, res[0] if blocked else None)


def _core_bwd(causal, with_aux, interpret, residuals, cts):
    q, k, v, valid, eot, out = residuals
    d_out, d_aux = cts
    del d_aux, eot
    # The aux output is consumed under stop_gradient in the model (the
    # reference detaches it, clip_wrapper.py:36), so its cotangent is zero;
    # differentiate only through the attention output.
    Tp = _round_up(max(q.shape[2], 8), _LANE)
    if Tp <= _MAX_SINGLE_BLOCK_T:
        dq, dk, dv = _pallas_attention_bwd(
            q, k, v, d_out, valid, causal=causal, interpret=interpret
        )
        return dq, dk, dv, None, None
    # Blockwise FlashAttention-2 backward past the single-block cap:
    # O(T·Dh + Qb·KVb) memory, no XLA escape at any sequence length.
    dq, dk, dv = _pallas_attention_bwd_blocked(
        q, k, v, d_out, out, valid, causal=causal, interpret=interpret
    )
    return dq, dk, dv, None, None


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_valid_len: Optional[Union[int, jnp.ndarray]] = None,
    attn_to_idx: Optional[Union[int, jnp.ndarray]] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused attention; same contract as ``attention_reference``.

    ``kv_valid_len`` / ``attn_to_idx`` accept either python ints (broadcast to
    the batch) or per-batch ``[B]`` int arrays.
    """
    if not _HAS_PLTPU:
        return attention_reference(
            q, k, v, causal=causal, kv_valid_len=kv_valid_len, attn_to_idx=attn_to_idx
        )
    B, H, T, Dh = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    valid = _as_array(kv_valid_len, B)
    if valid is None:
        valid = jnp.full((B,), T, jnp.int32)
    with_aux = attn_to_idx is not None
    eot = _as_array(attn_to_idx, B)
    if eot is None:
        eot = jnp.zeros((B,), jnp.int32)
    out, aux = _fused_attention_core(
        q, k, v, valid, eot, causal, with_aux, interpret
    )
    return out, (aux if with_aux else None)


def _as_array(x, batch: int):
    if x is None:
        return None
    if isinstance(x, int):
        return jnp.full((batch,), x, jnp.int32)
    return x.astype(jnp.int32)
