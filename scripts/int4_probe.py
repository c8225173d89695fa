"""Probe: does the v5e MXU run int4 GEMMs faster than int8?

Decides whether a W4A8 frozen-tower eval path is worth building.  Times
jitted XLA dots at a tower-like GEMM shape for (bf16, int8xint8,
int4xint4, int4xint8) operand mixes with the slope protocol.  If int4 is
not measurably faster than int8, the W4 path is dead on this chip
(storage halving alone doesn't pay — the tower weights already fit VMEM).

Usage: python scripts/int4_probe.py [M] [K] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts._bench_util import slope_time_args as slope


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    steps = 8
    n = 3 * steps + 1
    print(f"backend={jax.default_backend()} M={M} K={K} N={N}")
    fl = 2 * M * K * N

    seed = int(time.time() * 1e3) % (2 ** 31)

    def mk(dt_a, dt_b):
        @jax.jit
        def gen(k):
            ka, kb = jax.random.split(k)
            a = jax.random.randint(ka, (M, K), -7, 8, jnp.int8)
            b = jax.random.randint(kb, (K, N), -7, 8, jnp.int8)
            return a.astype(dt_a), b.astype(dt_b)
        return gen

    def dot(acc):
        @jax.jit
        def f(a, b):
            return jax.lax.dot(a, b, preferred_element_type=acc)
        return f

    cases = [
        ("bf16xbf16->f32", jnp.bfloat16, jnp.bfloat16, jnp.float32),
        ("int8xint8->i32", jnp.int8, jnp.int8, jnp.int32),
        ("int4xint4->i32", jnp.int4, jnp.int4, jnp.int32),
        ("int4xint8->i32", jnp.int4, jnp.int8, jnp.int32),
    ]
    for name, da, db, acc in cases:
        try:
            gen = mk(da, db)
            xs = [gen(jax.random.PRNGKey(seed + i)) for i in range(n)]
            jax.block_until_ready(xs)
            t = slope(dot(acc), xs, steps)
            print(f"{name}: {t*1e3:7.3f} ms  {fl/t/1e12:7.1f} T(FL)OP/s")
        except Exception as e:  # noqa: BLE001 — probe reports and moves on
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
