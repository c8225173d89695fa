"""A/B: fully-fused ViT layer (LN1+attn+LN2+MLP, one kernel) vs the two
production half-block kernels.

Hypothesis: fusing the two half-blocks saves one [bB, Tp, W] HBM round trip
per layer (the attention output re-read by the MLP kernel) — ~0.19 ms/layer
of traffic at B=256, ViT-B geometry — at the cost of holding both weight
sets and the [rows, H] hidden activation in VMEM simultaneously.
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

from tapclip_tpu.models.layers import init_attn, init_layer_norm, init_mlp
from tapclip_tpu.ops.fused_mha import _LOG2E, fused_attn_block
from tapclip_tpu.ops.fused_mlp import _gelu_exact, fused_mlp_block

PEAK = 197e12
_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def measure(fn, args, x0, steps=24):
    x = x0
    for _ in range(2):
        x = fn(*args, x)
    float(_SUM(x))
    t0 = time.perf_counter()
    float(_SUM(x))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(*args, x)
        float(_SUM(x))
        best = min(best, (time.perf_counter() - t0 - rtt) / steps)
    return best


def make_layer_kernel(n_heads, valid, eps, h_chunk):
    def kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
               g2_ref, b2_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
               o_ref, attn_s, mid_s):
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
        y = (y * g1_ref[0] + b1_ref[0]).astype(x.dtype)
        y2 = y.reshape(bB * Tp, W)

        heads_per_group = max(1, 128 // Dh)
        n_groups = n_heads // heads_per_group
        group_w = heads_per_group * Dh

        def one_head(q, k, v):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            s = jnp.where(key_mask[None], s * (scale * _LOG2E), neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return o / l

        def proj_group(col_off):
            g = jax.lax.dot_general(
                y2, wqkv_ref[:, pl.ds(col_off, group_w)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            return (g + bqkv_ref[0, pl.ds(col_off, group_w)]).reshape(bB, Tp, group_w)

        def body(g, carry):
            off = pl.multiple_of(g * group_w, group_w)
            qg = proj_group(off)
            kg = proj_group(W + off)
            vg = proj_group(2 * W + off).astype(x.dtype)
            outs = [
                one_head(
                    qg[:, :, i * Dh:(i + 1) * Dh],
                    kg[:, :, i * Dh:(i + 1) * Dh],
                    vg[:, :, i * Dh:(i + 1) * Dh],
                )
                for i in range(heads_per_group)
            ]
            attn_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(outs, -1).astype(
                attn_s.dtype
            )
            return carry

        jax.lax.fori_loop(0, n_groups, body, 0)

        out = jax.lax.dot_general(
            attn_s[:].reshape(bB * Tp, W), wout_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        mid = out + bout_ref[0] + x32.reshape(bB * Tp, W)  # f32 [rows, W]

        # --- MLP half-block on the VMEM-resident mid ---
        m2 = jnp.mean(mid, axis=-1, keepdims=True)
        v2 = jnp.mean(jnp.square(mid - m2), axis=-1, keepdims=True)
        y_mlp = ((mid - m2) * jax.lax.rsqrt(v2 + eps) * g2_ref[0] + b2_ref[0]).astype(
            x.dtype
        )

        H = wfc_ref.shape[1]
        n_chunks = H // h_chunk

        def mlp_chunk(j, carry):
            off = pl.multiple_of(j * h_chunk, h_chunk)
            h = jax.lax.dot_general(
                y_mlp, wfc_ref[:, pl.ds(off, h_chunk)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            h = _gelu_exact(h + bfc_ref[0, pl.ds(off, h_chunk)])
            part = jax.lax.dot_general(
                h.astype(x.dtype), wproj_ref[pl.ds(off, h_chunk), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

            @pl.when(j == 0)
            def _():
                mid_s[:] = part

            @pl.when(j > 0)
            def _():
                mid_s[:] += part

            return carry

        jax.lax.fori_loop(0, n_chunks, mlp_chunk, 0)
        o_ref[:] = (
            (mid_s[:] + bproj_ref[0] + mid).reshape(bB, Tp, W)
        ).astype(o_ref.dtype)

    return kernel


def run_fused_layer(ln1, attn, ln2, mlp, x, H_heads, valid, bB=8, h_chunk=None,
                    vmem_mb=96):
    B, T, W = x.shape
    Hd = mlp["w_fc"].shape[1]
    if h_chunk is None:
        h_chunk = Hd
    dtype = x.dtype
    kernel = make_layer_kernel(H_heads, valid, 1e-5, h_chunk)
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
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, Hd), lambda i: (0, 0)),
            pl.BlockSpec((1, Hd), lambda i: (0, 0)),
            pl.BlockSpec((Hd, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bB, T, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, W), dtype),
        scratch_shapes=[
            pltpu.VMEM((bB, T, W), jnp.float32),
            pltpu.VMEM((bB * T, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 12 * W
            + 4 * B * H_heads * T * T * (W // H_heads),
            bytes_accessed=2 * B * T * W * dtype.itemsize + 12 * W * W * 2,
            transcendentals=B * H_heads * T * T + B * T * 4 * W,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20),
    )(
        x,
        ln1["scale"].astype(jnp.float32).reshape(1, W),
        ln1["bias"].astype(jnp.float32).reshape(1, W),
        attn["w_qkv"].astype(dtype),
        attn["b_qkv"].astype(jnp.float32).reshape(1, 3 * W),
        attn["w_out"].astype(dtype),
        attn["b_out"].astype(jnp.float32).reshape(1, W),
        ln2["scale"].astype(jnp.float32).reshape(1, W),
        ln2["bias"].astype(jnp.float32).reshape(1, W),
        mlp["w_fc"].astype(dtype),
        mlp["b_fc"].astype(jnp.float32).reshape(1, Hd),
        mlp["w_proj"].astype(dtype),
        mlp["b_proj"].astype(jnp.float32).reshape(1, W),
    )


def main():
    B, T, W, H = 256, 200, 768, 12
    valid = 197
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    ln1, ln2 = init_layer_norm(W), init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)
    mlp = init_mlp(jax.random.PRNGKey(3), W, 4 * W)
    layer_fl = 2 * B * T * W * 12 * W + 4 * B * H * T * T * (W // H)

    def prod(ln1, attn, ln2, mlp, y):
        y = fused_attn_block(y, ln1, attn, H, valid_len=valid)
        return fused_mlp_block(y, ln2, mlp)

    base = jax.jit(prod)
    ref = base(ln1, attn, ln2, mlp, x)
    t = measure(base, (ln1, attn, ln2, mlp), x)
    print(f"two half-block kernels: {t*1e3:6.2f} ms ({layer_fl/t/PEAK*100:5.1f}% MXU)")

    for name, kw in [
        ("fused bB8", dict(bB=8)),
        ("fused bB4", dict(bB=4)),
        ("fused bB8 hc1536", dict(bB=8, h_chunk=1536)),
    ]:
        fn = jax.jit(functools.partial(run_fused_layer, H_heads=H, valid=valid, **kw))
        try:
            out = fn(ln1, attn, ln2, mlp, x)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t = measure(fn, (ln1, attn, ln2, mlp), x)
            print(f"{name:22s}: {t*1e3:6.2f} ms ({layer_fl/t/PEAK*100:5.1f}% MXU)  maxerr={err:.2e}")
        except Exception as e:
            print(f"{name:22s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
