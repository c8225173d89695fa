"""Roofline decomposition of the attention-block backward (VERDICT r4 #3).

The dedicated backward (`fused_mha._attn_block_bwd_kernel`) measures ~3.2 ms
at ViT-B pretraining geometry (bs=128) = 60% MXU vs a 1.9 ms naive roofline.
The stage-batched schedule A/B (scripts/attn_bwd_ab.py) measured neutral, so
the gap is not MXU/VPU serialization.  Hypothesis: the 60% is simply the
FLOP-weighted mix of two intrinsic efficiencies —

  * the five W-GEMMs (qkv recompute, dwqkv, dy, datt, dwout: 332 GFLOP)
    run near the large-GEMM ceiling (~90%);
  * the seven per-(batch,head) [T,T]-class GEMMs (s, o, dv, dp, ds, dq, dk:
    55 GFLOP) are pinned at ~39% by CLIP's head geometry: contraction or
    output width Dh=64 (half the 128-deep/128-wide MXU) x T=200 -> 256 lane
    round-up (78%).

This probe times each family standalone (plain XLA dots, slope protocol,
distinct inputs per dispatch) and checks that the composed prediction
reproduces the kernel's measured time.

Usage: python scripts/attn_bwd_roofline.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts._bench_util import slope_time_args as slope

PEAK = 197e12


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T, W, H = 200, 768, 12
    Dh = W // H
    R = B * T
    steps = 8
    print(f"backend={jax.default_backend()} B={B} T={T} W={W} H={H}")

    seed = int(time.time() * 1e3) % (2 ** 31)
    n = 3 * steps + 1

    def mk(shape, dt, i):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, dt), static_argnums=()
        )(jax.random.PRNGKey(seed + i))

    # --- family 1: the five W-GEMM shapes (bf16 inputs, f32 accum) ---
    # qkv recompute [R,W]@[W,3W]; dwqkv [W,R]@[R,3W]; dy [R,3W]@[3W,W];
    # datt [R,W]@[W,W]; dwout [W,R]@[R,W]
    def w_gemms(y, dqkv, g, wqkv, wout):
        qkv = y @ wqkv
        dwqkv = jax.lax.dot_general(
            y, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jax.lax.dot_general(
            dqkv, wqkv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        datt = jax.lax.dot_general(
            g, wout, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwout = jax.lax.dot_general(
            g, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (jnp.sum(qkv) + jnp.sum(dwqkv) + jnp.sum(dy) + jnp.sum(datt)
                + jnp.sum(dwout))

    wq = mk((W, 3 * W), jnp.bfloat16, 0)
    wo = mk((W, W), jnp.bfloat16, 1)

    def fresh_args_w(tag):
        # Fresh EVERY rep: reusing one arg set across reps lets later reps
        # repeat (executable, args) pairs the tunnel relay can serve
        # (CLAUDE.md; the round-4 head-pack A/B lesson).
        return [
            (mk((R, W), jnp.bfloat16, tag + 10 + 3 * i),
             mk((R, 3 * W), jnp.bfloat16, tag + 11 + 3 * i),
             mk((R, W), jnp.bfloat16, tag + 12 + 3 * i), wq, wo)
            for i in range(n)
        ]
    fl_w = (3 * 2 * R * W * 3 * W) + (2 * 2 * R * W * W)

    # --- family 2: the seven head-chain shapes, batched over (B, H) ---
    # s=q@k^T, o=p@v, dv=p^T@g, dp=g@v^T, dq=ds@k, dk=ds^T@q  (+1 recompute)
    BH = B * H

    def head_gemms(q, k, v, p, g):
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p, g, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = (dp * s).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # 6 distinct GEMMs (the kernel's 7th, the s recompute, would CSE
        # here — the FLOP count below uses 6)
        return (jnp.sum(s) + jnp.sum(o) + jnp.sum(dv) + jnp.sum(dp)
                + jnp.sum(dq) + jnp.sum(dk))

    def fresh_args_h(tag):
        return [
            (mk((BH, T, Dh), jnp.bfloat16, tag + 100 + 5 * i),
             mk((BH, T, Dh), jnp.bfloat16, tag + 101 + 5 * i),
             mk((BH, T, Dh), jnp.bfloat16, tag + 102 + 5 * i),
             mk((BH, T, T), jnp.bfloat16, tag + 103 + 5 * i),
             mk((BH, T, Dh), jnp.bfloat16, tag + 104 + 5 * i))
            for i in range(n)
        ]
    fl_h = 6 * 2 * BH * T * T * Dh

    f_w = jax.jit(w_gemms)
    f_h = jax.jit(head_gemms)

    args_w = args_h = None
    for rep in range(5):
        # Drop the previous rep's device buffers BEFORE allocating fresh
        # ones: the two generations together (~24 GB) exceed v5e HBM.
        args_w = args_h = None
        args_w = fresh_args_w(7919 * (rep + 1))
        jax.block_until_ready([a for tup in args_w for a in tup])
        t_w = slope(f_w, args_w, steps)
        args_w = None
        args_h = fresh_args_h(7919 * (rep + 1))
        jax.block_until_ready([a for tup in args_h for a in tup])
        t_h = slope(f_h, args_h, steps)
        print(
            f"rep{rep}: W-GEMMs {t_w*1e3:6.2f} ms "
            f"({fl_w/t_w/PEAK*100:5.1f}% MXU) | head-chain {t_h*1e3:6.2f} ms "
            f"({fl_h/t_h/PEAK*100:5.1f}% MXU) | sum {(t_w+t_h)*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
