"""Probe: int8 MXU matmul throughput vs bf16 via Pallas on v5e.

Decides whether the int8 frozen-tower eval path is worth building: v5e
advertises 394 int8 TOPS vs 197 bf16 TFLOPs.  Times a [R, W] @ [W, H] GEMM
in both dtypes with weights VMEM-resident.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def measure(fn, a, b, steps=30):
    x = fn(a, b)
    float(_SUM(x))
    t0 = time.perf_counter()
    float(_SUM(x))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(a, x[:, : b.shape[0]].astype(a.dtype) if False else b)
            a = a  # keep args fixed; relay cache busted by chained x? use sum drain
        float(_SUM(x))
        best = min(best, (time.perf_counter() - t0 - rtt) / steps)
    return best


def mm_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def make_mm(R, W, H, dtype, acc_dtype, row_tile=512):
    kernel = functools.partial(mm_kernel, out_dtype=acc_dtype)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(R // row_tile,),
            in_specs=[
                pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
                pl.BlockSpec((W, H), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((row_tile, H), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, H), acc_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * W * H, bytes_accessed=R * (W + H) * 2, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        )(x, w)

    return f


def main():
    R, W, H = 256 * 200, 768, 3072
    key = jax.random.PRNGKey(0)
    fl = 2 * R * W * H

    xb = jax.random.normal(key, (R, W), jnp.bfloat16)
    wb = jax.random.normal(key, (W, H), jnp.bfloat16)
    f_bf16 = make_mm(R, W, H, jnp.bfloat16, jnp.float32)
    t = measure(f_bf16, xb, wb)
    print(f"bf16 GEMM: {t*1e3:6.2f} ms  ({fl/t/1e12:6.1f} TF/s)")

    xi = jax.random.randint(key, (R, W), -127, 127, jnp.int8)
    wi = jax.random.randint(key, (W, H), -127, 127, jnp.int8)
    f_int8 = make_mm(R, W, H, jnp.int8, jnp.int32)
    try:
        t = measure(f_int8, xi, wi)
        print(f"int8 GEMM: {t*1e3:6.2f} ms  ({fl/t/1e12:6.1f} TOP/s)")
    except Exception as e:
        print("int8 GEMM FAILED:", str(e)[:400])

    # int8 inputs with f32 accumulate (dequant-in-kernel style)
    f_int8f = make_mm(R, W, H, jnp.int8, jnp.float32)
    try:
        t = measure(f_int8f, xi, wi)
        print(f"int8->f32 GEMM: {t*1e3:6.2f} ms  ({fl/t/1e12:6.1f} TOP/s)")
    except Exception as e:
        print("int8->f32 GEMM FAILED:", str(e)[:200])


if __name__ == "__main__":
    main()
