"""A/B: int8 attention half-block — per-head vs pair-packed core.

Round-4 follow-on to the bf16 head-pack win (scripts/head_pack_ab.py:
packed/perhead = 0.833 at ViT-L/14 224px).  The int8 kernel shares the
same per-head attention core, and int8 halves the projection time, so the
core is a LARGER share of the int8 block — the packed win should be at
least as large.  This script (1) checks numerics: same seed, packed vs
per-head outputs must agree to reduction-pairing ulp (the quantization
PRNG draws are schedule-independent); (2) measures the schedules with the
hardened protocol: interleaved reps, fresh inputs EVERY rep, two-chain
slope, float() drains.

Usage: python scripts/int8_pack_ab.py [vitl|vitb] [B] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.models.layers import init_attn, init_layer_norm
from tapclip_tpu.ops.int8_attn import int8_attn_block

from scripts._bench_util import slope_time_args as slope

PEAK_BF16 = 197e12


def main():
    geom = sys.argv[1] if len(sys.argv) > 1 else "vitl"
    if geom == "vitb":
        T, W, H, valid = 200, 768, 12, 197
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    else:
        # Default B=256, NOT 64: the int8 block is sub-ms at B=64 and the
        # slope signal drowns in tunnel jitter (measured: negative slopes);
        # the recorded 0.910 A/B used B=256.
        T, W, H, valid = 264, 1024, 16, 257
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    steps = 8
    print(f"backend={jax.default_backend()} {geom} B={B} T={T} W={W} H={H}")

    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)

    seed = int(time.time() * 1e3) % (2 ** 31)
    n = 3 * steps + 1
    mk = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))

    def fresh_inputs(tag):
        xs = [mk(jax.random.PRNGKey(seed + 7919 * tag + i)) for i in range(n)]
        jax.block_until_ready(xs)
        return xs

    fl = 2 * B * T * W * 4 * W + 2 * 2 * B * H * T * T * (W // H)

    def make(pair_packed):
        f = functools.partial(
            int8_attn_block, n_heads=H, valid_len=valid, seed=17,
            interpret=False, pair_packed=pair_packed,
        )
        return jax.jit(lambda x: f(x, ln, attn))

    variants = [("perhead", make(False)), ("packed", make(True))]

    xchk = mk(jax.random.PRNGKey(seed - 1))  # never reused by a timed chain
    a = variants[0][1](xchk)
    b = variants[1][1](xchk)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |perhead - packed| (same quant seed): {err:.2e}")
    assert err < 5e-2, err  # bf16-output ulp + reduction pairing only

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
        print(f"{name}: {med[name]*1e3:6.2f} ms "
              f"({fl/med[name]/PEAK_BF16*100:5.1f}% of bf16 peak)")
    print(f"packed/perhead = {med['packed']/med['perhead']:.3f}")


if __name__ == "__main__":
    main()
