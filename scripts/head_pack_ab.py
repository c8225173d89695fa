"""A/B: attention-block forward score/output GEMMs — per-head vs pair-packed.

Round-4 target (VERDICT #5): ViT-L/14 bf16 plateaus at 941 img/s; the named
untried lever is head-packed contractions.  `pair_packed_group` in
fused_mha._attn_block_kernel computes both Dh=64 heads of a 128-lane group as
one block-diagonal contraction pair: K becomes 128 (full MXU depth) and the
lane axis 2Tp, whose round-up amortizes (528->640 at ViT-L vs 264->384 per
head).  Tile arithmetic predicts ~1.2x on the s/o GEMMs at ViT-L geometry and
a wash at ViT-B (400->512 = 2*256).

Protocol: interleaved round-robin in one process, two-chain slope timing with
distinct device-generated inputs per dispatch, float() drains.

Usage: python scripts/head_pack_ab.py [vitl|vitb] [B] [reps]
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
    geom = sys.argv[1] if len(sys.argv) > 1 else "vitl"
    if geom == "vitb":
        T, W, H, valid = 200, 768, 12, 197
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    else:
        T, W, H, valid = 264, 1024, 16, 257
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    steps = 8
    print(f"backend={jax.default_backend()} {geom} B={B} T={T} W={W} H={H}")

    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)
    gamma = ln["scale"]
    beta = ln["bias"]
    wqkv = attn["w_qkv"].astype(jnp.bfloat16)
    bqkv = attn["b_qkv"]
    wout = attn["w_out"].astype(jnp.bfloat16)
    bout = attn["b_out"]

    seed = int(time.time() * 1e3) % (2 ** 31)
    n = 3 * steps + 1
    mk = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))

    def fresh_inputs(tag):
        # One distinct batch per timed dispatch, fresh PER REP: repeating an
        # (executable, args) pair in a later rep is relay-cacheable on the
        # tunnel (CLAUDE.md).  The two variants within a rep may share
        # inputs — they are different executables.
        xs = [mk(jax.random.PRNGKey(seed + 7919 * tag + i)) for i in range(n)]
        jax.block_until_ready(xs)
        return xs

    # forward block FLOPs: qkv + out-proj GEMMs + s/o per head
    fl = 2 * B * T * W * 4 * W + 2 * 2 * B * H * T * T * (W // H)

    def make(pair_packed):
        f = functools.partial(
            M._attn_block_fwd_impl,
            n_heads=H, valid=valid, eps=1e-5, block_b=8,
            interpret=False, causal=False, pair_packed=pair_packed,
        )
        return jax.jit(
            lambda x: f(x, gamma, beta, wqkv, bqkv, wout, bout)
        )

    variants = [("perhead", make(False)), ("packed", make(True))]

    xchk = mk(jax.random.PRNGKey(seed - 1))  # never reused by a timed chain
    a = variants[0][1](xchk)
    b = variants[1][1](xchk)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |perhead - packed|: {err:.2e}")

    times = {name: [] for name, _ in variants}
    for rep in range(reps):
        xs = fresh_inputs(rep + 1)
        row = []
        for name, fn in variants:
            t = slope(fn, [(x,) for x in xs], steps)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.2f}")
        print(f"rep{rep}: " + " | ".join(row))
    print("--- medians ---")
    med = {}
    for name, _ in variants:
        ts = sorted(times[name])
        med[name] = ts[len(ts) // 2]
        print(f"{name}: {med[name]*1e3:6.2f} ms ({fl/med[name]/PEAK*100:5.1f}% MXU)")
    print(f"packed/perhead = {med['packed']/med['perhead']:.3f}")


if __name__ == "__main__":
    main()
