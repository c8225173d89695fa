"""int8 fused MLP half-block for the frozen-tower EVAL path.

v5e's MXU runs int8 at 2x the bf16 rate (measured 241 TOP/s vs 183 TF/s on
this chip, scripts/int8_probe.py).  The MLP is ~2/3 of the image tower's
FLOPs, and the tower is frozen — a weight-quantized, activation-quantized
matmul path trades a bounded accuracy delta for throughput, opt-in via
``CLIPConfig.quantize_tower`` (eval only; training never routes here).

Scheme (standard W8A8 dynamic quantization, TPU-shaped):
  * weights: symmetric per-output-channel int8, quantized on the fly in XLA
    (cheap: one pass over the weights per call, hoisted outside the kernel);
  * activations: symmetric per-row (per-token) int8 with STOCHASTIC rounding
    inside the kernel (``pltpu.prng_random_bits``; floor(x + u) is unbiased),
  * GEMMs in int8 -> int32 on the MXU, dequantized with the product of row
    and column scales in f32; LN, GELU and the residual stay f32/bf16.

Cites: quantization-kernel pattern from the Pallas guide; reference has no
analogue (its tower runs f32 CUDA via open_clip).
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

from tapclip_tpu.ops.fused_mlp import _gelu_exact


def quantize_cols_int8(w: jnp.ndarray):
    """[K, N] f32 -> (int8 values, [1, N] f32 per-column scales)."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # [1, N]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _row_quant_sr(y: jnp.ndarray, bits: jnp.ndarray):
    """Per-row symmetric int8 with stochastic rounding.

    ``floor(x + u)``, u ~ U[0,1): unbiased for either sign.  Returns
    (int8 values, [R, 1] f32 per-row scales).
    """
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    # Mosaic has no uint32->f32 cast; (bits >> 8) < 2^24 fits int32 exactly.
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    q = jnp.floor(y / scale + u)
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _int8_mlp_kernel(
    seed_ref,  # SMEM [1] int32
    x_ref,  # VMEM [rt, W] compute dtype (pre-LN rows)
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wfc_ref,  # VMEM [W, H] int8
    sfc_ref,  # VMEM [1, H] f32 per-column scales
    bfc_ref,  # VMEM [1, H] f32
    wproj_ref,  # VMEM [H, W] int8
    sproj_ref,  # VMEM [1, W] f32
    bproj_ref,  # VMEM [1, W] f32
    o_ref,  # VMEM [rt, W]
    *,
    eps: float,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[0] + beta_ref[0]  # f32 [rt, W]

    bits1 = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
    yq, t1 = _row_quant_sr(y, bits1)
    acc = jax.lax.dot_general(
        yq, wfc_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [rt, H] int32
    h = acc.astype(jnp.float32) * t1 * sfc_ref[0] + bfc_ref[0]
    h = _gelu_exact(h)

    bits2 = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
    hq, t2 = _row_quant_sr(h, bits2)
    acc2 = jax.lax.dot_general(
        hq, wproj_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [rt, W] int32
    out = acc2.astype(jnp.float32) * t2 * sproj_ref[0] + bproj_ref[0]
    o_ref[:] = (out + x32).astype(o_ref.dtype)


def _xla_int8_reference(x, ln_params, mlp_params, eps):
    """Deterministic (round-to-nearest) XLA model of the same quantization —
    used off-TPU and as the numerics oracle in tests (no stochastic term)."""
    from tapclip_tpu.models import layers

    y = layers.layer_norm(x, ln_params, eps).astype(jnp.float32)
    wfc_q, sfc = quantize_cols_int8(mlp_params["w_fc"])
    wproj_q, sproj = quantize_cols_int8(mlp_params["w_proj"])

    def row_quant(v):
        amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(v / scale), -127, 127), scale

    yq, t1 = row_quant(y)
    h = (yq @ wfc_q.astype(jnp.float32)) * t1 * sfc + mlp_params["b_fc"]
    h = _gelu_exact(h)
    hq, t2 = row_quant(h)
    out = (hq @ wproj_q.astype(jnp.float32)) * t2 * sproj + mlp_params["b_proj"]
    return (out + x.astype(jnp.float32)).astype(x.dtype)


def int8_mlp_block(
    x: jnp.ndarray,  # [B, T, W]
    ln_params,
    mlp_params,
    *,
    eps: float = 1e-5,
    seed: int = 0,
    row_tile: int = 256,
    interpret: Optional[bool] = None,
    deterministic: bool = False,
) -> jnp.ndarray:
    """``x + mlp_int8(layer_norm(x))``; eval-only (no custom VJP — training
    must not route here; ``block_forward`` gates on ``quantize_tower``).

    ``deterministic=True`` forces the round-to-nearest XLA model on every
    platform (``CLIPConfig.int8_deterministic``): reproducible logits at the
    cost of the stochastic-rounding kernel's throughput."""
    B, T, W = x.shape
    H = mlp_params["w_fc"].shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = B * T
    # int8 sublane tile is 32: shrink the row tile to a divisor of R.
    while row_tile >= 32 and R % row_tile:
        row_tile //= 2
    if (
        deterministic
        or not _HAS_PLTPU
        or W % 128
        or H % 128
        or T % 8
        or row_tile < 32
        or interpret
    ):
        # Interpret mode lacks the TPU PRNG; use the deterministic model.
        return _xla_int8_reference(x, ln_params, mlp_params, eps)

    wfc_q, sfc = quantize_cols_int8(mlp_params["w_fc"])
    wproj_q, sproj = quantize_cols_int8(mlp_params["w_proj"])
    x2 = x.reshape(R, W)
    dtype = x.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, W), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((W, H), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, H), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, H), lambda i, *_: (0, 0)),
            pl.BlockSpec((H, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, W), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, W), lambda i, *_: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, W), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * W * H,
            bytes_accessed=2 * R * W * x.dtype.itemsize + W * H * 2,
            transcendentals=2 * R * H,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(
        jnp.asarray([seed], jnp.int32),
        x2,
        ln_params["scale"].astype(jnp.float32).reshape(1, W),
        ln_params["bias"].astype(jnp.float32).reshape(1, W),
        wfc_q,
        sfc.reshape(1, H),
        mlp_params["b_fc"].astype(jnp.float32).reshape(1, H),
        wproj_q,
        sproj.reshape(1, W),
        mlp_params["b_proj"].astype(jnp.float32).reshape(1, W),
    )
    return out.reshape(B, T, W)
