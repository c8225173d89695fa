"""Hardened A/B of int8 fused-MLP variants (round 5).

Motivation: the int8 W8A8 path nets only ~1.10x end-to-end over bf16
(4,506 vs 4,083 eval img/s) although the int8 MXU runs ~2x bf16.  Tile
arithmetic says the int8 MLP kernel is VPU-BOUND: per [256, W] row tile the
LN + PRNG + quantize (f32 divides!) + dequantize + exact-GELU chain is
~23 us of VPU work against ~13-20 us of int8 MXU time — halving the GEMM
time exposed the elementwise chain that the bf16 kernel hides behind its
2x-longer MXU schedule.  Variants attack the two biggest VPU terms:

  erf3     : A&S 3-term erf (|err| <= 2.5e-5 — THREE orders below the int8
             quantization noise, so numerically free here, unlike the
             bit-exact bf16 path)
  recipmul : quantize via y * (127/amax) instead of y / (amax/127) — the
             broadcast f32 divide over [rt, H] is the single hottest
             non-GELU elementwise op; rounding differs only when y/s lands
             within an ulp of an integer boundary (~1e-7 of elements, +-1
             quantum)
  both     : the two combined

Protocol: hardened (interleaved A-B-A-B in one process, FRESH device
inputs per chain, two-chain slope, float() drains).

Usage: python scripts/int8_mlp_ab.py [B] [preset] [reps]
"""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tapclip_tpu.models.layers import init_layer_norm, init_mlp
from scripts._bench_util import erf3 as _erf3, erf5 as _erf5
from tapclip_tpu.ops.int8_mlp import int8_mlp_block, quantize_cols_int8

INT8_PEAK = 373e12  # XLA int8 dot roofline measured on this chip (int4_probe)
_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def make_kernel(eps, erf3=False, recipmul=False):
    erf = _erf3 if erf3 else _erf5

    def quant(v, bits):
        amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
        if recipmul:
            inv = 127.0 / jnp.maximum(amax, 1e-8)
            q = jnp.floor(v * inv + u)
            scale = 1.0 / inv
        else:
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.floor(v / scale + u)
        return jnp.clip(q, -127, 127).astype(jnp.int8), scale

    def kernel(seed_ref, x_ref, gamma_ref, beta_ref, wfc_ref, sfc_ref,
               bfc_ref, wproj_ref, sproj_ref, bproj_ref, o_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = x_ref[:]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * gamma_ref[0] + beta_ref[0]
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
        yq, t1 = quant(y, bits1)
        acc = jax.lax.dot_general(
            yq, wfc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * t1 * sfc_ref[0] + bfc_ref[0]
        h = 0.5 * h * (1.0 + erf(h * (2.0 ** -0.5)))
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        hq, t2 = quant(h, bits2)
        acc2 = jax.lax.dot_general(
            hq, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc2.astype(jnp.float32) * t2 * sproj_ref[0] + bproj_ref[0]
        o_ref[:] = (out + x32).astype(o_ref.dtype)

    return kernel


def run_variant(ln, mlp, x, row_tile=256, erf3=False, recipmul=False):
    B, T, W = x.shape
    H = mlp["w_fc"].shape[-1]
    R = B * T
    assert R % row_tile == 0, (
        f"rows {R} not divisible by row_tile {row_tile} — the grid would "
        "silently drop the tail rows and skew the A/B")
    x2 = x.reshape(R, W)
    dtype = x.dtype
    wfc_q, sfc = quantize_cols_int8(mlp["w_fc"])
    wproj_q, sproj = quantize_cols_int8(mlp["w_proj"])
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
        make_kernel(1e-5, erf3=erf3, recipmul=recipmul),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, W), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * W * H,
            bytes_accessed=2 * R * W * x.dtype.itemsize + W * H * 2,
            transcendentals=2 * R * H,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(
        jnp.asarray([0], jnp.int32),
        x2,
        ln["scale"].astype(jnp.float32).reshape(1, W),
        ln["bias"].astype(jnp.float32).reshape(1, W),
        wfc_q,
        sfc.reshape(1, H),
        mlp["b_fc"].astype(jnp.float32).reshape(1, H),
        wproj_q,
        sproj.reshape(1, W),
        mlp["b_proj"].astype(jnp.float32).reshape(1, W),
    )
    return out.reshape(B, T, W)


def main():
    from tapclip_tpu.config import MODEL_PRESETS

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    cfg = MODEL_PRESETS[name]
    W = cfg.vision_width
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    T = (n_tok + 7) // 8 * 8
    H = cfg.mlp_ratio * W
    print(f"backend={jax.default_backend()} {name} B={B} T={T} W={W} H={H}")

    fresh = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))
    ln = init_layer_norm(W)
    mlp = init_mlp(jax.random.PRNGKey(2), W, H)
    fl = 2 * 2 * B * T * W * H

    variants = {
        "production": jax.jit(
            lambda ln, m, y: int8_mlp_block(y, ln, m, seed=0)),
        "erf3": jax.jit(functools.partial(run_variant, erf3=True)),
        "recipmul": jax.jit(functools.partial(run_variant, recipmul=True)),
        "both": jax.jit(
            functools.partial(run_variant, erf3=True, recipmul=True)),
    }

    x0 = fresh(jax.random.PRNGKey(0))
    ref = variants["production"](ln, mlp, x0)
    float(_SUM(ref))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    for nm, fn in variants.items():
        out = fn(ln, mlp, x0)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"compiled {nm:12s} maxerr={err:.2e} (tensor scale {scale:.1f};"
              " stochastic draws differ across schedules)")

    K1, K2 = 8, 24

    def chain(fn, x, steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(ln, mlp, x)
        float(_SUM(x))
        return time.perf_counter() - t0

    results = {nm: [] for nm in variants}
    kidx = 100
    for rep in range(reps):
        for nm, fn in variants.items():
            xa = fresh(jax.random.PRNGKey(kidx)); kidx += 1
            xb = fresh(jax.random.PRNGKey(kidx)); kidx += 1
            t1 = chain(fn, xa, K1)
            t2 = chain(fn, xb, K2)
            results[nm].append((t2 - t1) / (K2 - K1))
            print(f"rep{rep} {nm:12s} {results[nm][-1]*1e3:6.3f} ms",
                  flush=True)

    print("\n=== medians ===")
    base = statistics.median(results["production"])
    for nm, ts in results.items():
        med = statistics.median(ts)
        print(f"{nm:12s}: {med*1e3:6.3f} ms ({fl/med/INT8_PEAK*100:5.1f}% of"
              f" int8 roofline)  ratio={med/base:.3f}  "
              f"reps={[f'{t*1e3:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
