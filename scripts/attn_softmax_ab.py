"""A/B variants of the attention half-block softmax chain (round-3 late).

The ViT-L/14 decomposition (docs/PERF.md) pinned the bf16 gap on the
attention block's VPU softmax chain: ~6 elementwise passes over the
[Tp, Tp] score tile per head (scale-mul, mask select, max, sub, exp2,
row-sum).  Variants probe the exact-math levers:

  v1_qkcast    — q/k slices cast to the input dtype before the score GEMM
  v2_foldq     — v1 + scale*log2(e) folded into q at [Tp, group_w]
                 granularity (removes the [Tp, Tp] mul pass)
  v3_tailsel   — v2 + mask select applied only to the last lane tile
                 (cols 256:264 — the only ones containing padding at
                 ViT-L geometry)
  v4_zerokv    — v2 + pad K/V rows zeroed per group + analytic row-sum
                 correction l' = l - n_pad * exp2(-m) (no select at all)
  v6_summxu    — v3 + row-sum l via 64 ones columns appended to v (the
                 p@v GEMM emits [o | l...]; no VPU cross-lane reduce)
  v10_swpipe   — v6 + group-loop software pipeline (proj GEMMs for group
                 g+1 issued before group g's softmax)

RESULT (v5e, ViT-L geometry B=128 T=264 W=1024, interleaved A-B-A-B in
one process, fresh seed per process — single-shot cross-process numbers
swing +-15% and once showed a spurious 16% "win"):

  production 2.31 ms  ==  v6 2.31 ms; every variant within noise; swpipe
  variants 8-13% SLOWER (the explicit carry defeats Mosaic's scheduling).

  v1 is BIT-IDENTICAL to production => Mosaic already truncates the
  f32 x f32 score dot to a single-pass bf16 MXU op; no f32 penalty
  existed.  Removing ~half the VPU softmax work changes nothing =>
  the VPU chain is already fully overlapped with the MXU at bB=4; the
  remaining gap to the GEMM roofline is the attention GEMMs' small
  dimensions (Dh=64 contraction / 64-wide output on a 128x128 MXU),
  not VPU occupancy.  The same conclusion held for the BACKWARD kernel
  (opt formulation: scale folded into q pre-GEMM, unnormalized e with
  all 1/l row scalings commuted through the GEMMs onto [Tp, Dh] fixups,
  flash-attention row term rowsum(dp.p) == rowsum(g.o)): numerics match
  to 5e-7 but timing is neutral-to-worse within +-15% tunnel noise at
  both ViT-B and ViT-L pretraining geometry.  See docs/PERF.md
  "negative results".

Usage: python scripts/attn_softmax_ab.py [vitl|vitb] [bB]
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
_LOG2E = 1.4426950408889634

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def measure(fn, ln, attn, x0, steps=24):
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


def make_kernel(n_heads, valid, eps, *, qk_cast=False, fold_q=False,
                mask_mode="full", group_heads=None, sum_mxu=False,
                tail_split=False, swpipe=False):
    """mask_mode: 'full' | 'tail' (select on the last lane tile only,
    requires valid > Tp - 8 and a 128-aligned tile boundary below Tp) |
    'zerokv' (no select; zero pad K/V rows, correct the row sum).
    sum_mxu: row-sum l computed by augmenting v with 64 ones columns so the
    p@v GEMM emits [o | l...] in one [Tp, 128] output (no VPU reduce).
    tail_split: split keys at the last 128 tile and run the softmax pieces
    separately (no concat, no full-width select)."""

    def kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, o_ref, attn_s):
        bB, Tp, W = x_ref.shape
        Dh = W // n_heads
        scale = Dh ** -0.5
        neg = jnp.float32(-1e30)
        n_pad = Tp - valid

        if mask_mode == "tail" or tail_split:
            tile0 = (Tp // 128) * 128  # last lane-tile boundary below Tp
            ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp - tile0), 1)
            tail_mask = (tile0 + ki) < valid
        elif mask_mode == "full":
            ki = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
            key_mask = ki < valid
        elif mask_mode == "zerokv":
            row_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0) < valid
            ).astype(jnp.float32)
        if sum_mxu:
            # 64 ones columns appended to v: the p@v GEMM then emits
            # [o | l l l ...] as one [Tp, 128] result — the row-sum rides
            # the MXU instead of a VPU cross-lane reduce.
            ones_cols = jnp.ones((1, Tp, 128 - Dh), x_ref.dtype)

        x = x_ref[:]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * gamma_ref[0] + beta_ref[0]).astype(x.dtype)
        y2 = y.reshape(bB * Tp, W)

        heads_per_group = group_heads or max(1, 128 // Dh)
        n_groups = n_heads // heads_per_group
        group_w = heads_per_group * Dh

        def one_head_tailsplit(q, k, v):
            # Keys split at the last 128-lane tile boundary: the main block
            # [Tp, tile0] is all-valid (no mask) and vreg-aligned; the tail
            # [Tp, 8] carries the pad mask.  No concat, no full-width select.
            tile0 = (Tp // 128) * 128
            k_main, k_tail = k[:, :tile0, :], k[:, tile0:, :]
            v_main, v_tail = v[:, :tile0, :], v[:, tile0:, :]
            s_main = jax.lax.dot_general(
                q, k_main, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bB, Tp, tile0]
            s_tail = jax.lax.dot_general(
                q, k_tail, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bB, Tp, Tp - tile0]
            if not fold_q:
                s_main = s_main * (scale * _LOG2E)
                s_tail = s_tail * (scale * _LOG2E)
            s_tail = jnp.where(tail_mask[None], s_tail, neg)
            m = jnp.maximum(
                jnp.max(s_main, axis=-1, keepdims=True),
                jnp.max(s_tail, axis=-1, keepdims=True),
            )
            p_main = jnp.exp2(s_main - m)
            p_tail = jnp.exp2(s_tail - m)
            l = (
                jnp.sum(p_main, axis=-1, keepdims=True)
                + jnp.sum(p_tail, axis=-1, keepdims=True)
            )
            o = jax.lax.dot_general(
                p_main.astype(v.dtype), v_main, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p_tail.astype(v.dtype), v_tail, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return o / l

        def one_head_summxu(q, k, v):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if not fold_q:
                s = s * (scale * _LOG2E)
            tile0 = (Tp // 128) * 128
            s_main = s[:, :, :tile0]
            s_tail = jnp.where(tail_mask[None], s[:, :, tile0:], neg)
            s = jnp.concatenate([s_main, s_tail], axis=-1)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(v.dtype)
            v_ext = jnp.concatenate(
                [v, jnp.broadcast_to(ones_cols, (v.shape[0], Tp, 128 - Dh))],
                axis=-1,
            )  # [bB, Tp, 128]
            out = jax.lax.dot_general(
                p, v_ext, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bB, Tp, 128] = [o | l ...]
            return out[:, :, :Dh] / out[:, :, Dh : 2 * Dh]

        def one_head_batched(q, k, v):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bB, Tp, Tp] f32
            if not fold_q:
                s = s * (scale * _LOG2E)
            if mask_mode == "full":
                s = jnp.where(key_mask[None], s, neg)
            elif mask_mode == "tail":
                tile0 = (Tp // 128) * 128
                s_main = s[:, :, :tile0]
                s_tail = jnp.where(tail_mask[None], s[:, :, tile0:], neg)
                s = jnp.concatenate([s_main, s_tail], axis=-1)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if mask_mode == "zerokv":
                # pad K rows are zero => s_pad = 0 exactly => each pad
                # column contributed exp2(-m); remove analytically.
                l = l - n_pad * jnp.exp2(-m)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return o / l

        def proj_group(col_off):
            g = jax.lax.dot_general(
                y2,
                wqkv_ref[:, pl.ds(col_off, group_w)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (g + bqkv_ref[0, pl.ds(col_off, group_w)]).reshape(
                bB, Tp, group_w
            )

        def load_group(g):
            off = pl.multiple_of(g * group_w, group_w)
            qg = proj_group(off)
            kg = proj_group(W + off)
            vg = proj_group(2 * W + off)
            if fold_q:
                qg = qg * (scale * _LOG2E)
            if mask_mode == "zerokv":
                kg = kg * row_ok[None]
                vg = vg * row_ok[None]
            if qk_cast:
                qg = qg.astype(x.dtype)
                kg = kg.astype(x.dtype)
            vg = vg.astype(x.dtype)
            return qg, kg, vg

        def softmax_group(g, qg, kg, vg):
            off = pl.multiple_of(g * group_w, group_w)
            head_fn = (
                one_head_summxu
                if sum_mxu
                else (one_head_tailsplit if tail_split else one_head_batched)
            )
            outs = [
                head_fn(
                    qg[:, :, i * Dh:(i + 1) * Dh],
                    kg[:, :, i * Dh:(i + 1) * Dh],
                    vg[:, :, i * Dh:(i + 1) * Dh],
                )
                for i in range(heads_per_group)
            ]
            attn_s[:, :, pl.ds(off, group_w)] = jnp.concatenate(
                outs, axis=-1
            ).astype(attn_s.dtype)

        if swpipe:
            # Software pipeline: issue group g+1's projection GEMMs before
            # group g's softmax, so the VPU chain overlaps the next group's
            # MXU work instead of serialising behind it.
            def body(g, carry):
                nxt = load_group((g + 1) % n_groups)
                softmax_group(g, *carry)
                return nxt

            jax.lax.fori_loop(0, n_groups, body, load_group(0))
        else:
            def body(g, carry):
                softmax_group(g, *load_group(g))
                return carry

            jax.lax.fori_loop(0, n_groups, body, 0)

        out = jax.lax.dot_general(
            attn_s[:].reshape(bB * Tp, W),
            wout_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (
            (out + bout_ref[0]).reshape(bB, Tp, W) + x32
        ).astype(o_ref.dtype)

    return kernel


def run_variant(ln, attn, x, H, valid, bB=4, vmem_mb=64, **kw):
    B, T, W = x.shape
    dtype = x.dtype
    kernel = make_kernel(H, valid, 1e-5, **kw)
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
        scratch_shapes=[pltpu.VMEM((bB, T, W), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 4 * W + 4 * B * H * T * T * (W // H),
            bytes_accessed=2 * B * T * W * dtype.itemsize + 4 * W * W * 2,
            transcendentals=B * H * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2 ** 20
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
    if len(sys.argv) > 1 and sys.argv[1] == "vitb":
        B, T, W, H = 256, 200, 768, 12
        valid = 197
    else:
        B, T, W, H = 128, 264, 1024, 16
        valid = 257
    bB = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # fresh seed per process: a repeated (executable, args) chain across
    # invocations is relay-cacheable on this tunnel (CLAUDE.md).
    seed = int(time.time() * 1e3) % (2 ** 31)
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
        jax.random.PRNGKey(seed)
    )
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(2), W)
    attn_fl = 2 * B * T * W * 4 * W + 4 * B * H * T * T * (W // H)

    base = jax.jit(
        lambda ln, at, y: fused_attn_block(y, ln, at, H, valid_len=valid)
    )
    ref = base(ln, attn, x)

    variants = {
        "v3_tailsel": dict(qk_cast=True, fold_q=True, mask_mode="tail"),
        "v6_summxu": dict(qk_cast=True, fold_q=True, mask_mode="tail",
                          sum_mxu=True),
        "v6b_full": dict(qk_cast=True, fold_q=True, mask_mode="full",
                         sum_mxu=True),
        "v6c_nofold": dict(qk_cast=True, mask_mode="tail", sum_mxu=True),
    }
    t = measure(base, ln, attn, x)
    print(f"production      : {t*1e3:6.2f} ms ({attn_fl/t/PEAK*100:5.1f}% MXU)")
    results = {}
    for name, kw in variants.items():
        fn = jax.jit(
            functools.partial(run_variant, H=H, valid=valid, bB=bB, **kw)
        )
        try:
            out = fn(ln, attn, x)
            err = float(
                jnp.max(
                    jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
                )
            )
            t = measure(fn, ln, attn, x)
            results[name] = t
            print(
                f"{name:16s}: {t*1e3:6.2f} ms ({attn_fl/t/PEAK*100:5.1f}% MXU)"
                f"  maxerr={err:.2e}"
            )
        except Exception as e:
            print(f"{name:16s}: FAILED {str(e)[:200]}")
    t = measure(base, ln, attn, x)
    print(f"production(re)  : {t*1e3:6.2f} ms ({attn_fl/t/PEAK*100:5.1f}% MXU)")


if __name__ == "__main__":
    main()
