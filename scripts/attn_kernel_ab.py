"""A/B experimental variants of the fused attention half-block kernel.

Current production kernel: 2.17 ms/layer at B=256 T=200 W=768 (63.8% of the
GEMM roofline).  Variants probe where the loss is:
  v0_current   — production kernel (baseline)
  v1_group256  — 4 heads per fori_loop iteration (fewer, wider group loads)
  v2_ln1pass   — LN stats via E[x^2]-E[x]^2 in one reduction pass
  v3_perhead_qkv — per-group qkv GEMM slices (no full 3W scratch pass)
  v4_bb8       — batch block 8 (chunked weights: out-proj in 2 col chunks)
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

from tapclip_tpu.models.layers import init_attn, init_layer_norm
from tapclip_tpu.ops.fused_mha import fused_attn_block

PEAK = 197e12

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def measure(fn, ln, attn, x0, steps=24):
    """fn(ln, attn, x) -> x'; weights passed as ARGS (a closure would embed
    them as constants — bloats the compile payload and, worse, XLA places
    constant weights in scoped VMEM inside the kernel: 18.3M > 16M OOM)."""
    x = x0
    for _ in range(2):
        x = fn(ln, attn, x)
    float(_SUM(x))
    t0 = time.perf_counter()
    float(_SUM(x))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(ln, attn, x)
        float(_SUM(x))
        best = min(best, (time.perf_counter() - t0 - rtt) / steps)
    return best


def make_interleaved_kernel(n_heads, valid, eps, group_heads):
    """Per head-group: qkv GEMM slices -> attention -> out-proj partial
    accumulate.  No full-width scratch passes; GEMM and VPU work interleave
    across groups."""

    def kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, o_ref, acc_s):
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
        y = (y * gamma_ref[0] + beta_ref[0]).astype(x.dtype)
        y2 = y.reshape(bB * Tp, W)

        group_w = group_heads * Dh
        n_groups = n_heads // group_heads

        def one_head(q, k, v):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            s = jnp.where(key_mask[None], s * scale, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            return jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        def body(g, carry):
            off = pl.multiple_of(g * group_w, group_w)
            qg = (jax.lax.dot_general(
                y2, wqkv_ref[:, pl.ds(off, group_w)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bqkv_ref[0, pl.ds(off, group_w)]).reshape(bB, Tp, group_w)
            kg = (jax.lax.dot_general(
                y2, wqkv_ref[:, pl.ds(W + off, group_w)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bqkv_ref[0, pl.ds(W + off, group_w)]).reshape(bB, Tp, group_w)
            vg = (jax.lax.dot_general(
                y2, wqkv_ref[:, pl.ds(2 * W + off, group_w)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bqkv_ref[0, pl.ds(2 * W + off, group_w)]).astype(x.dtype).reshape(bB, Tp, group_w)
            outs = [
                one_head(
                    qg[:, :, i * Dh:(i + 1) * Dh],
                    kg[:, :, i * Dh:(i + 1) * Dh],
                    vg[:, :, i * Dh:(i + 1) * Dh],
                )
                for i in range(group_heads)
            ]
            attn_g = jnp.concatenate(outs, -1).astype(x.dtype).reshape(bB * Tp, group_w)
            part = jax.lax.dot_general(
                attn_g, wout_ref[pl.ds(off, group_w), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

            @pl.when(g == 0)
            def _():
                acc_s[:] = part

            @pl.when(g > 0)
            def _():
                acc_s[:] += part

            return carry

        jax.lax.fori_loop(0, n_groups, body, 0)
        o_ref[:] = (
            (acc_s[:] + bout_ref[0]).reshape(bB, Tp, W) + x32
        ).astype(o_ref.dtype)

    return kernel


def run_interleaved(ln, attn, x, H, valid, group_heads=2, bB=8, vmem_mb=48):
    B, T, W = x.shape
    dtype = x.dtype
    kernel = make_interleaved_kernel(H, valid, 1e-5, group_heads)
    return pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, W), dtype),
        scratch_shapes=[pltpu.VMEM((bB * T, W), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 4 * W + 4 * B * H * T * T * (W // H),
            bytes_accessed=2 * B * T * W * dtype.itemsize + 4 * W * W * 2,
            transcendentals=B * H * T * T,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20),
    )(
        x,
        ln["scale"].astype(jnp.float32).reshape(1, W),
        ln["bias"].astype(jnp.float32).reshape(1, W),
        attn["w_qkv"].astype(dtype),
        attn["b_qkv"].astype(jnp.float32).reshape(1, 3 * W),
        attn["w_out"].astype(dtype),
        attn["b_out"].astype(jnp.float32).reshape(1, W),
    )


def make_variant_kernel(n_heads, valid, eps, group_heads, ln_1pass, perhead_qkv,
                        softmax_opt=False):
    def kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
               o_ref, qkv_s, attn_s):
        bB, Tp, W = x_ref.shape
        Dh = W // n_heads
        scale = Dh ** -0.5
        ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
        key_mask = ki < valid
        neg = jnp.float32(-1e30)

        x = x_ref[:]
        x32 = x.astype(jnp.float32)
        if ln_1pass:
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            msq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
            var = msq - mean * mean
        else:
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * gamma_ref[0] + beta_ref[0]).astype(x.dtype)

        group_w = group_heads * Dh
        n_groups = n_heads // group_heads

        if not perhead_qkv:
            qkv = jax.lax.dot_general(
                y.reshape(bB * Tp, W), wqkv_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            qkv_s[:] = (qkv + bqkv_ref[0]).astype(x.dtype).reshape(bB, Tp, 3 * W)

        def one_head(q, k, v):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            if softmax_opt:
                # exp2 with the scale and log2(e) folded into one constant,
                # and the 1/l normalisation deferred past the p@v dot: the
                # divide shrinks from [Tp, Tp] to [Tp, Dh] elements.
                s = jnp.where(key_mask[None], s * (scale * 1.4426950408889634), neg)
                m = jnp.max(s, axis=-1, keepdims=True)
                if softmax_opt == "bf16":
                    # exponential evaluated at bf16 width; the row-sum
                    # accumulates f32. Costs ~0.4% relative noise on p.
                    p = jnp.exp2((s - m).astype(jnp.bfloat16))
                    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                else:
                    p = jnp.exp2(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return o / l
            s = jnp.where(key_mask[None], s * scale, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            return jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        y2 = y.reshape(bB * Tp, W) if perhead_qkv else None

        def body(g, carry):
            off = pl.multiple_of(g * group_w, group_w)
            if perhead_qkv:
                qg = (jax.lax.dot_general(
                    y2, wqkv_ref[:, pl.ds(off, group_w)],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ) + bqkv_ref[0, pl.ds(off, group_w)]).reshape(bB, Tp, group_w)
                kg = (jax.lax.dot_general(
                    y2, wqkv_ref[:, pl.ds(W + off, group_w)],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ) + bqkv_ref[0, pl.ds(W + off, group_w)]).reshape(bB, Tp, group_w)
                vg = (jax.lax.dot_general(
                    y2, wqkv_ref[:, pl.ds(2 * W + off, group_w)],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ) + bqkv_ref[0, pl.ds(2 * W + off, group_w)]).astype(x.dtype).reshape(bB, Tp, group_w)
            else:
                qg = qkv_s[:, :, pl.ds(off, group_w)].astype(jnp.float32)
                kg = qkv_s[:, :, pl.ds(W + off, group_w)].astype(jnp.float32)
                vg = qkv_s[:, :, pl.ds(2 * W + off, group_w)]
            outs = [
                one_head(
                    qg[:, :, i * Dh:(i + 1) * Dh].astype(jnp.float32),
                    kg[:, :, i * Dh:(i + 1) * Dh].astype(jnp.float32),
                    vg[:, :, i * Dh:(i + 1) * Dh],
                )
                for i in range(group_heads)
            ]
            attn_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(outs, -1).astype(attn_s.dtype)
            return carry

        jax.lax.fori_loop(0, n_groups, body, 0)

        out = jax.lax.dot_general(
            attn_s[:].reshape(bB * Tp, W), wout_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[:] = ((out + bout_ref[0]).reshape(bB, Tp, W) + x32).astype(o_ref.dtype)

    return kernel


def run_variant(ln, attn, x, H, valid, group_heads=2, ln_1pass=False,
                perhead_qkv=False, softmax_opt=False, bB=4, vmem_mb=None):
    B, T, W = x.shape
    dtype = x.dtype
    kernel = make_variant_kernel(H, valid, 1e-5, group_heads, ln_1pass, perhead_qkv,
                                 softmax_opt)
    return pl.pallas_call(
        kernel,
        grid=(B // bB,),
        in_specs=[
            pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, W), dtype),
        scratch_shapes=[
            pltpu.VMEM((bB, T, 3 * W), dtype),
            pltpu.VMEM((bB, T, W), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 4 * W + 4 * B * H * T * T * (W // H),
            bytes_accessed=2 * B * T * W * dtype.itemsize + 4 * W * W * 2,
            transcendentals=B * H * T * T,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
            if vmem_mb else None
        ),
    )(
        x,
        ln["scale"].astype(jnp.float32).reshape(1, W),
        ln["bias"].astype(jnp.float32).reshape(1, W),
        attn["w_qkv"].astype(dtype),
        attn["b_qkv"].astype(jnp.float32).reshape(1, 3 * W),
        attn["w_out"].astype(dtype),
        attn["b_out"].astype(jnp.float32).reshape(1, W),
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "vitl":
        B, T, W, H = 128, 264, 1024, 16
        valid = 257
    else:
        B, T, W, H = 256, 200, 768, 12
        valid = 197
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)
    attn_fl = 2 * B * T * W * 4 * W + 4 * B * H * T * T * (W // H)

    base = jax.jit(
        lambda ln, at, y: fused_attn_block(y, ln, at, H, valid_len=valid)
    )
    ref = base(ln, attn, x)

    variants = {
        "bb8_ph_smopt": (run_variant, dict(bB=8, perhead_qkv=True, softmax_opt=True,
                                           vmem_mb=48)),
        "bb8_ph_smopt_v64": (run_variant, dict(bB=8, perhead_qkv=True,
                                               softmax_opt=True, vmem_mb=64)),
        "bb8_ph_smopt_v32": (run_variant, dict(bB=8, perhead_qkv=True,
                                               softmax_opt=True, vmem_mb=32)),
    }
    t = measure(base, ln, attn, x)
    print(f"production          : {t*1e3:6.2f} ms ({attn_fl/t/PEAK*100:5.1f}% MXU)")
    for name, (runner, kw) in variants.items():
        fn = jax.jit(functools.partial(runner, H=H, valid=valid, **kw))
        try:
            out = fn(ln, attn, x)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t = measure(fn, ln, attn, x)
            print(f"{name:20s}: {t*1e3:6.2f} ms ({attn_fl/t/PEAK*100:5.1f}% MXU)  maxerr={err:.2e}")
        except Exception as e:
            print(f"{name:20s}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
