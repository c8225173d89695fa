"""int8 fused attention half-block for the frozen-tower EVAL path.

Companion to :mod:`tapclip_tpu.ops.int8_mlp` (same W8A8 scheme, same chip
rationale: v5e's MXU runs int8 at ~2x the bf16 rate).  The qkv and output
projections — the attention block's weight GEMMs, ~8·R·W² of its ~8·R·W² +
4·B·H·T²·Dh FLOPs — run int8→int32 on the MXU; LayerNorm, the attention core
(scores, softmax, p·v) and the residual stay f32/bf16 exactly as in
``fused_mha._attn_block_kernel``.

Scheme:
  * weights: symmetric per-output-column int8, quantized on the fly in XLA
    (hoisted out of the kernel — the tower is frozen, XLA CSEs it per call);
  * activations: symmetric per-row int8 with stochastic rounding
    (``pltpu.prng_random_bits``; floor(x+u) is unbiased);
  * eval-only: no VJP by design (training must not silently optimize
    against quantization noise).

Reference has no analogue (its tower is open_clip f32 CUDA;
/root/reference/models/clip_wrapper.py:10-15).
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

from tapclip_tpu.ops.fused_mha import (
    _LOG2E,
    _pair_packed_attention,
    _pick_attn_block_b,
    _resolve_pair_packed,
)
from tapclip_tpu.ops.int8_mlp import _row_quant_sr, quantize_cols_int8


def _int8_attn_kernel(
    seed_ref,  # SMEM [1] int32
    x_ref,  # VMEM [bB, Tp, W] residual input (pre-LN), compute dtype
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wqkv_ref,  # VMEM [W, 3W] int8
    sqkv_ref,  # VMEM [1, 3W] f32 per-column scales
    bqkv_ref,  # VMEM [1, 3W] f32
    wout_ref,  # VMEM [W, W] int8
    sout_ref,  # VMEM [1, W] f32
    bout_ref,  # VMEM [1, W] f32
    o_ref,  # VMEM [bB, Tp, W]
    attn_s,  # VMEM scratch [bB, Tp, W] f32
    *,
    n_heads: int,
    valid: int,
    eps: float,
    pair_packed: bool = False,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    bB, Tp, W = x_ref.shape
    Dh = W // n_heads
    scale = Dh ** -0.5
    ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_mask = ki < valid
    neg = jnp.float32(-1e30)

    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma_ref[0] + beta_ref[0]).reshape(bB * Tp, W)  # f32

    bits = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
    yq, t1 = _row_quant_sr(y, bits)  # int8 [R, W], f32 [R, 1]
    t1b = t1.reshape(bB, Tp, 1)

    heads_per_group = max(1, 128 // Dh)
    n_groups = n_heads // heads_per_group
    group_w = heads_per_group * Dh

    def one_head_batched(q, k, v):
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # exp2 softmax with deferred 1/l (see fused_mha._attn_block_kernel).
        s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return o / l

    def proj_group(col_off):
        acc = jax.lax.dot_general(
            yq,
            wqkv_ref[:, pl.ds(col_off, group_w)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(bB, Tp, group_w)
        return (
            acc.astype(jnp.float32) * t1b * sqkv_ref[0, pl.ds(col_off, group_w)]
            + bqkv_ref[0, pl.ds(col_off, group_w)]
        )

    def body(g, carry):
        off = pl.multiple_of(g * group_w, group_w)
        qg = proj_group(off)
        kg = proj_group(W + off)
        vg = proj_group(2 * W + off).astype(x.dtype)
        if pair_packed:
            # Same block-diagonal Dh=64 head-pair packing as the bf16 block
            # kernel (shared fused_mha._pair_packed_attention; win measured
            # on chip at ViT-L/14 224px, T=264).  The int8 projections feed
            # the identical f32 q/k and compute-dtype v the per-head path
            # sees, and the quantization PRNG draws (y before the loop, the
            # attention output after it) are schedule-independent, so both
            # schedules see identical quantization noise per seed.
            outs = [_pair_packed_attention(qg, kg, vg, valid=valid, scale=scale)]
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

    a = attn_s[:].reshape(bB * Tp, W)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(a.shape), jnp.uint32)
    aq, t2 = _row_quant_sr(a, bits2)
    out = jax.lax.dot_general(
        aq, wout_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = out.astype(jnp.float32) * t2 * sout_ref[0] + bout_ref[0]
    o_ref[:] = (out.reshape(bB, Tp, W) + x32).astype(o_ref.dtype)


def _xla_int8_attn_reference(x, ln_params, attn_params, n_heads, valid, eps):
    """Deterministic (round-to-nearest) XLA model of the same quantization —
    off-TPU fallback and numerics oracle for tests."""
    from tapclip_tpu.models import layers
    from tapclip_tpu.ops.attention import attention_reference

    B, T, W = x.shape
    y = layers.layer_norm(x, ln_params, eps).astype(jnp.float32)
    wqkv_q, sqkv = quantize_cols_int8(attn_params["w_qkv"])
    wout_q, sout = quantize_cols_int8(attn_params["w_out"])

    def row_quant(v):
        amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(v / s), -127, 127), s

    yq, t1 = row_quant(y)
    qkv = (yq @ wqkv_q.astype(jnp.float32)) * t1 * sqkv + attn_params["b_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, n_heads, W // n_heads).transpose(0, 2, 1, 3)

    kv = None if valid == T else valid
    out, _ = attention_reference(heads(q), heads(k), heads(v), kv_valid_len=kv)
    a = out.transpose(0, 2, 1, 3).reshape(B, T, W)
    aq, t2 = row_quant(a)
    o = (aq @ wout_q.astype(jnp.float32)) * t2 * sout + attn_params["b_out"]
    return (o + x.astype(jnp.float32)).astype(x.dtype)


def int8_attn_block(
    x: jnp.ndarray,  # [B, T, W]
    ln_params,
    attn_params,
    n_heads: int,
    *,
    valid_len: Optional[int] = None,
    eps: float = 1e-5,
    seed: int = 0,
    block_b: int = 8,
    interpret: Optional[bool] = None,
    deterministic: bool = False,
    pair_packed: Optional[bool] = None,
) -> jnp.ndarray:
    """``x + out_proj(attn(qkv(layer_norm(x))))`` with int8 projections;
    eval-only (no custom VJP). ``deterministic=True`` forces the
    round-to-nearest XLA model everywhere (``CLIPConfig.int8_deterministic``)."""
    B, T, W = x.shape
    Dh = W // n_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    valid = valid_len if valid_len is not None else T
    if (
        deterministic
        or not _HAS_PLTPU
        or interpret
        or W % 128
        or T % 8
        or Dh % 8
        or n_heads % max(1, 128 // Dh)
    ):
        # Interpret mode lacks the TPU PRNG; use the deterministic model.
        return _xla_int8_attn_reference(x, ln_params, attn_params, n_heads, valid, eps)

    # Head-pair packing routes by the same measured lane-round-up rule as the
    # bf16 block kernel (int8 is vision-tower eval only, so never causal);
    # the VMEM picker must budget the schedule that will actually run.
    pair_packed = _resolve_pair_packed(T, W, n_heads, False, pair_packed)
    bB = _pick_attn_block_b(B, T, W, block_b, pair_packed=pair_packed)
    if bB * T % 32:  # int8 sublane tile
        return _xla_int8_attn_reference(x, ln_params, attn_params, n_heads, valid, eps)

    wqkv_q, sqkv = quantize_cols_int8(attn_params["w_qkv"])
    wout_q, sout = quantize_cols_int8(attn_params["w_out"])
    dtype = x.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, T, W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i, *_: (0, 0)),
            pl.BlockSpec((W, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, T, W), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bB, T, W), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _int8_attn_kernel,
            n_heads=n_heads,
            valid=valid,
            eps=eps,
            pair_packed=pair_packed,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 4 * W + 4 * B * n_heads * T * T * Dh,
            bytes_accessed=2 * B * T * W * dtype.itemsize + 4 * W * W,
            transcendentals=B * n_heads * T * T,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(
        jnp.asarray([seed], jnp.int32),
        x,
        ln_params["scale"].astype(jnp.float32).reshape(1, W),
        ln_params["bias"].astype(jnp.float32).reshape(1, W),
        wqkv_q,
        sqkv.reshape(1, 3 * W),
        attn_params["b_qkv"].astype(jnp.float32).reshape(1, 3 * W),
        wout_q,
        sout.reshape(1, W),
        attn_params["b_out"].astype(jnp.float32).reshape(1, W),
    )
    return out
