"""A/B: attention-block backward schedule — per-head serial vs stage-batched.

Round-4 target (VERDICT #3): the dedicated attention-block backward measures
4.39 ms/layer at ViT-B pretraining geometry vs a ~1.9 ms GEMM roofline.  Per
head the softmax-gradient chain is strictly serial
(s -> softmax -> o/dv/dp -> ds -> dq/dk), so the MXU idles through every VPU
stage and vice versa.  The stage-batched schedule
(`fused_mha._attn_block_bwd_kernel(stage_batched=True)`) runs each stage for
ALL heads in the group before advancing, giving Mosaic's static scheduler
independent MXU work adjacent to every VPU stage.

Protocol: interleaved A-B-A-B in one process (single-shot cross-process
numbers swing +-15% on this tunnel), two-chain slope timing with distinct
device-generated inputs per dispatch, float() drains (scripts/_bench_util).

Usage: python scripts/attn_bwd_ab.py [vitb|vitl] [B]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tapclip_tpu.ops.fused_mha as M
from tapclip_tpu.models.layers import init_attn, init_layer_norm

from scripts._bench_util import slope_time_args as slope

PEAK = 197e12


def main():
    geom = sys.argv[1] if len(sys.argv) > 1 else "vitb"
    if geom == "vitl":
        T, W, H, valid = 264, 1024, 16, 257
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    else:
        T, W, H, valid = 200, 768, 12, 197
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = 8
    print(f"backend={jax.default_backend()} {geom} B={B} T={T} W={W} H={H}")

    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)
    gamma = ln["scale"]
    beta = ln["bias"]
    wqkv = attn["w_qkv"].astype(jnp.bfloat16)
    bqkv = attn["b_qkv"]
    wout = attn["w_out"].astype(jnp.bfloat16)

    # Distinct (x, g) per dispatch — relay-cache hazard (CLAUDE.md).
    seed = int(time.time() * 1e3) % (2 ** 31)
    n = 3 * steps + 1
    mk = jax.jit(
        lambda k: jax.random.normal(k, (2, B, T, W), jnp.bfloat16)
    )
    def fresh_xg(tag):
        # One distinct batch per timed dispatch, fresh PER REP: repeating an
        # (executable, args) pair in a later rep is relay-cacheable on the
        # tunnel (CLAUDE.md); variants within a rep are distinct executables.
        xg = [mk(jax.random.PRNGKey(seed + 7919 * tag + i)) for i in range(n)]
        jax.block_until_ready(xg)
        return xg

    xg_chk = mk(jax.random.PRNGKey(seed - 1))  # never reused by a timed chain

    # Backward GEMM roofline FLOPs (docs/PERF.md round-4): 3x the W-GEMMs
    # (datt/dwout/dy share shape with dwqkv/proj counterparts) + 6 per-head
    # [T,T]-class GEMMs.
    Dh = W // H
    fl = (3 * 2 * B * T * W * 3 * W) + (2 * 2 * B * T * W * W) \
        + 6 * 2 * B * H * T * T * Dh

    def make(stage_batched, block_b=8, dw=False, budget_mb=None,
             pair_packed=None):
        def f(gm, bt, wq, bq, wo, pair):
            saved = M._ATTN_BWD_VMEM_BUDGET
            if budget_mb is not None:
                M._ATTN_BWD_VMEM_BUDGET = budget_mb * 2 ** 20
            try:
                return M._attn_block_bwd_impl(
                    pair[0], gm, bt, wq, bq, wo, pair[1],
                    n_heads=H, valid=valid, eps=1e-5, block_b=block_b,
                    interpret=False, causal=False,
                    stage_batched=stage_batched, dw_interleave=dw,
                    pair_packed=pair_packed,
                )
            finally:
                M._ATTN_BWD_VMEM_BUDGET = saved
        return jax.jit(f)

    mode = sys.argv[4] if len(sys.argv) > 4 else "dw"
    if mode == "pack":
        # Round-5 pair-packed backward chain (VERDICT round-4 follow-up):
        # production comparator is the auto route (staged at ViT-B, serial
        # at ViT-L), challenger packs both Dh=64 heads per chain GEMM.
        variants = [
            ("serial/b8", make(False, 8)),
            ("packed/b8", make(False, 8, pair_packed=True)),
            ("staged/b8", make(True, 8)),
            ("packed/b4", make(False, 4, pair_packed=True)),
        ]
    else:
        variants = [
            ("serial/b8", make(False, 8)),
            ("staged/b8", make(True, 8)),
            ("staged+dw/auto", make(True, 8, dw=True)),
            ("staged+dw/b8v80", make(True, 8, dw=True, budget_mb=80)),
            ("serial+dw/auto", make(False, 8, dw=True)),
        ]

    # numerics cross-check once (all variants vs the first)
    ref = variants[0][1](gamma, beta, wqkv, bqkv, wout, xg_chk)
    for name, fn in variants[1:]:
        out = fn(gamma, beta, wqkv, bqkv, wout, xg_chk)
        err = max(
            float(jnp.max(jnp.abs(
                u.astype(jnp.float32) - v.astype(jnp.float32))))
            for u, v in zip(jax.tree.leaves(ref), jax.tree.leaves(out))
        )
        print(f"max |serial/b8 - {name}| over all grads: {err:.2e}")

    # interleaved round-robin: every variant timed once per rep, medians at
    # the end — single-shot cross-process numbers swing +-15% on this tunnel.
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    times = {name: [] for name, _ in variants}
    for rep in range(reps):
        xg = fresh_xg(rep + 1)
        args = [(gamma, beta, wqkv, bqkv, wout, xg[i]) for i in range(n)]
        row = []
        for name, fn in variants:
            t = slope(fn, args, steps)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.2f}")
        print(f"rep{rep}: " + " | ".join(row))
    print("--- medians ---")
    med = {}
    for name, _ in variants:
        ts = sorted(times[name])
        med[name] = ts[len(ts) // 2]
        print(
            f"{name}: {med[name]*1e3:6.2f} ms"
            f" ({fl/med[name]/PEAK*100:5.1f}% MXU)"
        )
    best = min(med, key=med.get)
    print(f"best: {best}  staged_b8/serial_b8 = "
          f"{med['staged/b8']/med['serial/b8']:.3f}")


if __name__ == "__main__":
    main()
