"""Hardened A/B of fused-MLP half-block variants (ViT-B geometry by default).

Round-5 rewrite (VERDICT #3): the round-2 version measured each variant
sequentially with min-of-3 over a REUSED x0 — later repetitions replay
identical (executable, args) chains, which the tunnel relay can serve
(the round-4 head-pack trap).  This version follows the hardened protocol:

  * interleaved A-B-A-B reps in ONE process;
  * FRESH x0 (jitted keyed normal, device-generated) for EVERY chain;
  * two-chain-length slope timing ((t_K2 - t_K1)/(K2-K1)) with float()
    drains — constants (RTT, dispatch) cancel in the slope;
  * median over reps reported, all reps printed.

Question under test: ViT-B's fused MLP runs 82% of GEMM ideal vs ViT-L's
88.5% (docs/PERF.md).  The gap hypothesis is the exposed (un-overlapped)
fraction of the VPU chain — LN stats + exact-GELU transcendentals — which
is RELATIVELY larger at W=768 (VPU work/MXU work ~ 1/W).  Variants:

  production   : fused_mlp_block as shipped (row_tile=256, 5-term erf,
                 two-pass LN, monolithic H GEMMs)
  rt512        : row_tile 512 (re-test under the hardened protocol)
  erf3         : A&S 7.1.25 3-term erf (max |err| 2.5e-5, far below bf16
                 resolution) — ~40% fewer VPU ops in the GELU
  ln1pass      : one-pass LN stats (var = E[x^2] - mean^2)
  ilv4 / ilv2  : hidden dim split into 4 / 2 chunks inside the kernel
                 body with a software-skewed schedule — GEMM1 of chunk
                 j+1 issued before GELU of chunk j, so the MXU has
                 independent work adjacent to every VPU stage (the
                 fused-MHA proj_group trick applied to the MLP)
  ilv4_erf3    : both levers together

Usage: python scripts/mlp_kernel_ab.py [B] [preset]   (default 256 ViT-B-16)
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
from tapclip_tpu.ops.fused_mlp import fused_mlp_block

PEAK = 197e12
_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def make_kernel(eps, erf3=False, ln1pass=False, ilv_chunks=1):
    erf = _erf3 if erf3 else _erf5

    def gelu(h):
        return 0.5 * h * (1.0 + erf(h * (2.0 ** -0.5)))

    def kernel(x_ref, gamma_ref, beta_ref, wfc_ref, bfc_ref, wproj_ref,
               bproj_ref, o_ref):
        x = x_ref[:]
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        if ln1pass:
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mean)
        else:
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * gamma_ref[0] + beta_ref[0]).astype(dt)

        H = wfc_ref.shape[-1]
        if ilv_chunks == 1:
            h = jax.lax.dot_general(
                y, wfc_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = gelu(h + bfc_ref[0])
            out = jax.lax.dot_general(
                h.astype(dt), wproj_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[:] = (out + bproj_ref[0] + x32).astype(o_ref.dtype)
            return

        # Software-skewed chunk schedule: at step j the GEMM producing
        # h_{j+1} is issued BEFORE the GELU consuming h_j, so Mosaic's
        # static scheduler sees independent MXU work adjacent to the VPU
        # chain (serial form: GEMM1 | GELU | GEMM2 with nothing to overlap).
        hc = H // ilv_chunks

        def fc_chunk(j):
            h = jax.lax.dot_general(
                y, wfc_ref[:, pl.ds(j * hc, hc)], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return h + bfc_ref[0, pl.ds(j * hc, hc)]

        acc = x32 + bproj_ref[0]
        h_cur = fc_chunk(0)
        for j in range(ilv_chunks):
            h_next = fc_chunk(j + 1) if j + 1 < ilv_chunks else None
            g = gelu(h_cur)
            acc = acc + jax.lax.dot_general(
                g.astype(dt), wproj_ref[pl.ds(j * hc, hc), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            h_cur = h_next
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def run_variant(ln, mlp, x, row_tile=256, vmem_mb=64, erf3=False,
                ln1pass=False, ilv_chunks=1):
    B, T, W = x.shape
    H = mlp["w_fc"].shape[-1]
    R = B * T
    assert R % row_tile == 0, (
        f"rows {R} not divisible by row_tile {row_tile} — the grid would "
        "silently drop the tail rows and skew the A/B")
    dtype = x.dtype
    x2 = x.reshape(R, W)
    out = pl.pallas_call(
        make_kernel(1e-5, erf3=erf3, ln1pass=ln1pass, ilv_chunks=ilv_chunks),
        grid=(R // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, W), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * W * H,
            bytes_accessed=2 * R * W * dtype.itemsize + 2 * W * H * 2,
            transcendentals=R * H,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2 ** 20
        ),
    )(
        x2,
        ln["scale"].astype(jnp.float32).reshape(1, W),
        ln["bias"].astype(jnp.float32).reshape(1, W),
        mlp["w_fc"].astype(dtype),
        mlp["b_fc"].astype(jnp.float32).reshape(1, H),
        mlp["w_proj"].astype(dtype),
        mlp["b_proj"].astype(jnp.float32).reshape(1, W),
    )
    return out.reshape(B, T, W)


def main():
    from tapclip_tpu.config import MODEL_PRESETS

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
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
        "production": jax.jit(lambda ln, m, y: fused_mlp_block(y, ln, m)),
        "rt512": jax.jit(functools.partial(run_variant, row_tile=512)),
        "erf3": jax.jit(functools.partial(run_variant, erf3=True)),
        "ln1pass": jax.jit(functools.partial(run_variant, ln1pass=True)),
        "ilv2": jax.jit(functools.partial(run_variant, ilv_chunks=2)),
        "ilv4": jax.jit(functools.partial(run_variant, ilv_chunks=4)),
        "ilv4_erf3": jax.jit(
            functools.partial(run_variant, ilv_chunks=4, erf3=True)),
    }

    # Compile + numerics check (vs production), one drained call each.
    x0 = fresh(jax.random.PRNGKey(0))
    ref = variants["production"](ln, mlp, x0)
    float(_SUM(ref))
    for nm, fn in variants.items():
        try:
            out = fn(ln, mlp, x0)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"compiled {nm:12s} maxerr={err:.2e}")
        except Exception as e:
            print(f"compile FAILED {nm}: {str(e)[:200]}")
            variants[nm] = None
    variants = {nm: fn for nm, fn in variants.items() if fn is not None}

    K1, K2, REPS = 8, 24, 7

    def chain(fn, x, steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(ln, mlp, x)
        float(_SUM(x))
        return time.perf_counter() - t0

    results = {nm: [] for nm in variants}
    kidx = 100
    for rep in range(REPS):
        for nm, fn in variants.items():
            xa = fresh(jax.random.PRNGKey(kidx)); kidx += 1
            xb = fresh(jax.random.PRNGKey(kidx)); kidx += 1
            t1 = chain(fn, xa, K1)
            t2 = chain(fn, xb, K2)
            slope = (t2 - t1) / (K2 - K1)
            results[nm].append(slope)
            print(f"rep{rep} {nm:12s} {slope*1e3:6.3f} ms", flush=True)

    print("\n=== medians ===")
    base = statistics.median(results["production"])
    for nm, ts in results.items():
        med = statistics.median(ts)
        print(f"{nm:12s}: {med*1e3:6.3f} ms ({fl/med/PEAK*100:5.1f}% MXU)  "
              f"ratio={med/base:.3f}  reps={[f'{t*1e3:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
