"""Fused transformer MLP half-block: LayerNorm -> fc -> GELU -> proj -> +residual.

Profile-driven (v5e, ViT-B/16 bs=256, after the fused-MHA kernel landed): one
XLA fusion around the MLP costs ~4.3 ms/layer — the [B, T, 4W] hidden
activation makes an HBM round trip and the LN/GELU passes add more traffic.
This kernel keeps everything for a row tile in VMEM:

    x_tile -> LN (f32 stats) -> @w_fc + b_fc -> exact GELU -> @w_proj + b_proj
           -> + x_tile (residual)

Both weight matrices stay resident in VMEM across the whole grid (their
block index never changes), so HBM traffic is just x in / out once.

Rows are the flattened [B*T] axis — callers run the tower at a sublane
multiple T (see ``clip.encode_image``), making the flatten layout-free.

Backward: custom VJP recomputing through the XLA composition (the vision
tower is frozen — forward-only is the hot path; text-side bwd is tiny).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf primitive; this uses only exp. The approximation error
    is far below bf16 resolution and ~1e-7 in f32 — indistinguishable from
    exact GELU for these activations.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


_INV_SQRT_2PI = 0.3989422804014327


def _gelu_and_grad(z: jnp.ndarray):
    """(gelu(z), gelu'(z)) sharing the erf evaluation.

    gelu'(z) = Φ(z) + z·φ(z) with Φ(z) = 0.5(1+erf(z/√2)) and
    φ(z) = exp(-z²/2)/√(2π)."""
    cdf = 0.5 * (1.0 + _erf_poly(z * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    return z * cdf, cdf + z * pdf


def _mlp_kernel(
    x_ref,  # VMEM [R, W] input rows (pre-LN), compute dtype
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wfc_ref,  # VMEM [W, Hc] — hidden-dim chunk j
    bfc_ref,  # VMEM [1, Hc] f32
    wproj_ref,  # VMEM [Hc, W]
    bproj_ref,  # VMEM [1, W] f32
    o_ref,  # VMEM [R, W]
    acc_ref,  # VMEM scratch [R, W] f32 — partial sums across hidden chunks
    *,
    eps: float,
):
    """Grid (row_tiles, h_chunks): large models' MLP weights exceed VMEM, so
    the hidden dim is chunked; partial products accumulate in f32 scratch and
    the output (with residual) is written on the last chunk."""
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma_ref[0] + beta_ref[0]).astype(x.dtype)

    h = jax.lax.dot_general(
        y, wfc_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = _gelu_exact(h + bfc_ref[0])
    part = jax.lax.dot_general(
        h.astype(x.dtype),
        wproj_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part + bproj_ref[0] + x32

    @pl.when(j > 0)
    def _():
        acc_ref[:] += part

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _mlp_bwd_kernel(
    x_ref,  # VMEM [R, W] saved forward input (pre-LN), compute dtype
    g_ref,  # VMEM [R, W] output cotangent
    gamma_ref,  # VMEM [1, W] f32
    beta_ref,  # VMEM [1, W] f32
    wfc_ref,  # VMEM [W, H]
    bfc_ref,  # VMEM [1, H] f32
    wproj_ref,  # VMEM [H, W]
    dx_ref,  # VMEM [R, W] out — blocked over rows
    dgamma_ref,  # VMEM [1, W] f32 out — grid-resident accumulator
    dbeta_ref,  # VMEM [1, W] f32 out
    dwfc_ref,  # VMEM [W, H] f32 out
    dbfc_ref,  # VMEM [1, H] f32 out
    dwproj_ref,  # VMEM [H, W] f32 out
    dbproj_ref,  # VMEM [1, W] f32 out
    *,
    eps: float,
):
    """Dedicated MLP half-block backward: recompute the forward for the row
    tile in VMEM (LN → fc → GELU), then the six gradient GEMM-equivalents —
    dh = g·w_projᵀ, dw_proj = hᵀ·g, dh_pre = dh⊙gelu'(h_pre),
    dy = dh_pre·w_fcᵀ, dw_fc = yᵀ·dh_pre, plus the analytic LN backward —
    with the [R, H] hidden tensors never leaving VMEM (the XLA recompute
    path round-trips y, h_pre, h and dh through HBM).  Weight-gradient
    accumulators have a constant block index: Pallas keeps them VMEM-resident
    across the whole row grid and flushes once."""
    i = pl.program_id(0)
    x = x_ref[:]
    dt = x.dtype
    W = x.shape[-1]

    # --- recompute forward for this row tile (matches _mlp_kernel exactly) ---
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (x32 - mean) * rstd  # normalised, pre-affine
    y = (n * gamma_ref[0] + beta_ref[0]).astype(dt)
    h_pre = jax.lax.dot_general(
        y, wfc_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bfc_ref[0]
    h, dgelu = _gelu_and_grad(h_pre)

    # --- gradients ---
    g32 = g_ref[:].astype(jnp.float32)
    gc = g32.astype(dt)
    dh = jax.lax.dot_general(  # [R, H] = g @ w_projᵀ
        gc, wproj_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwproj_part = jax.lax.dot_general(  # [H, W] = hᵀ @ g
        h.astype(dt), gc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh_pre = dh * dgelu
    dhc = dh_pre.astype(dt)
    dy = jax.lax.dot_general(  # [R, W] = dh_pre @ w_fcᵀ
        dhc, wfc_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwfc_part = jax.lax.dot_general(  # [W, H] = yᵀ @ dh_pre
        y, dhc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    # LayerNorm backward (affine params + input).
    dgamma_part = jnp.sum(dy * n, axis=0, keepdims=True)
    dbeta_part = jnp.sum(dy, axis=0, keepdims=True)
    dn = dy * gamma_ref[0]
    dx_ln = rstd * (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - n * jnp.mean(dn * n, axis=-1, keepdims=True)
    )
    dx_ref[:] = (g32 + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dgamma_ref[:] = dgamma_part
        dbeta_ref[:] = dbeta_part
        dwfc_ref[:] = dwfc_part
        dbfc_ref[:] = jnp.sum(dh_pre, axis=0, keepdims=True)
        dwproj_ref[:] = dwproj_part
        dbproj_ref[:] = jnp.sum(g32, axis=0, keepdims=True)

    @pl.when(i > 0)
    def _():
        dgamma_ref[:] += dgamma_part
        dbeta_ref[:] += dbeta_part
        dwfc_ref[:] += dwfc_part
        dbfc_ref[:] += jnp.sum(dh_pre, axis=0, keepdims=True)
        dwproj_ref[:] += dwproj_part
        dbproj_ref[:] += jnp.sum(g32, axis=0, keepdims=True)


def _xla_composition(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps):
    from tapclip_tpu.models import layers

    p_ln = {"scale": gamma, "bias": beta}
    p_mlp = {"w_fc": w_fc, "b_fc": b_fc, "w_proj": w_proj, "b_proj": b_proj}
    return x + layers.mlp_forward(layers.layer_norm(x, p_ln, eps), p_mlp, "gelu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_mlp_vjp(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps, row_tile, interpret):
    return _fused_mlp_fwd_impl(
        x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps, row_tile, interpret
    )


def _fwd(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps, row_tile, interpret):
    out = _fused_mlp_vjp(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps, row_tile, interpret)
    return out, (x, gamma, beta, w_fc, b_fc, w_proj, b_proj)


def _bwd(eps, row_tile, interpret, res, g):
    x, gamma, beta, w_fc, b_fc, w_proj, b_proj = res
    W, H = w_fc.shape
    # The dedicated kernel keeps the [R, H] hidden tensors in VMEM and the
    # f32 weight-gradient accumulators grid-resident; it needs the whole
    # (weights + accumulators) set to fit under the scoped-VMEM cap.
    # 2·W·H bf16 weights + 2·W·H f32 accumulators + ~6 row_tile·H f32 tiles.
    fits = (
        2 * W * H * 2 + 2 * W * H * 4 + 6 * row_tile * H * 4
    ) <= _BWD_VMEM_BUDGET
    if fits:
        return _fused_mlp_bwd_impl(
            x, gamma, beta, w_fc, b_fc, w_proj, b_proj, g, eps, row_tile,
            interpret,
        )
    _, vjp = jax.vjp(
        lambda *a: _xla_composition(*a, eps), x, gamma, beta, w_fc, b_fc, w_proj, b_proj
    )
    return vjp(g)


_fused_mlp_vjp.defvjp(_fwd, _bwd)


_BWD_VMEM_BUDGET = 52 * 2 ** 20


def _fused_mlp_bwd_impl(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, g, eps,
                        row_tile, interpret):
    from jax.experimental.pallas import tpu as pltpu_local

    B, T, W = x.shape
    H = w_fc.shape[-1]
    R = B * T
    dtype = x.dtype
    x2 = x.reshape(R, W)
    g2 = g.reshape(R, W)

    dx, dgamma, dbeta, dwfc, dbfc, dwproj, dbproj = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        grid=(R // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, W), lambda i: (i, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, W), dtype),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((W, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * R * W * H,
            bytes_accessed=3 * R * W * x.dtype.itemsize + 3 * W * H * 4,
            transcendentals=2 * R * H,
        ),
        compiler_params=pltpu_local.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20
        ),
        interpret=interpret,
    )(
        x2,
        g2,
        gamma.astype(jnp.float32).reshape(1, W),
        beta.astype(jnp.float32).reshape(1, W),
        w_fc.astype(dtype),
        b_fc.astype(jnp.float32).reshape(1, H),
        w_proj.astype(dtype),
    )
    # Keep downstream consumers (e.g. the scan-transpose's gradient scatter
    # into the stacked [L, W, H] array) OUT of the custom-call fusion: when
    # XLA merges them, the merged fusion is budgeted at the default 16M
    # scoped-vmem cap and the per-call vmem_limit override is lost —
    # observed as "scoped allocation 27.77M > 16M" under grad-of-scan.
    dx, dgamma, dbeta, dwfc, dbfc, dwproj, dbproj = jax.lax.optimization_barrier(
        (dx, dgamma, dbeta, dwfc, dbfc, dwproj, dbproj)
    )
    return (
        dx.reshape(B, T, W),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
        dbeta.reshape(beta.shape).astype(beta.dtype),
        dwfc.astype(w_fc.dtype),
        dbfc.reshape(b_fc.shape).astype(b_fc.dtype),
        dwproj.astype(w_proj.dtype),
        dbproj.reshape(b_proj.shape).astype(b_proj.dtype),
    )


def fused_mlp_block(
    x: jnp.ndarray,  # [B, T, W] (T must be a multiple of 8 for a free flatten)
    ln_params,
    mlp_params,
    *,
    eps: float = 1e-5,
    row_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``x + mlp(layer_norm(x))`` fused; falls back to XLA off-TPU/unaligned."""
    B, T, W = x.shape
    H = mlp_params["w_fc"].shape[-1]
    gamma, beta = ln_params["scale"], ln_params["bias"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if row_tile is None:
        # 256 measured best end-to-end on v5e for both ViT-B and ViT-L
        # widths (512 looked better in isolated-kernel runs but loses ~0.5%
        # in the full tower).
        row_tile = 256
    R = B * T
    if W % 128 or H % 128 or T % 8 or R % row_tile:
        return _xla_composition(
            x, gamma, beta, mlp_params["w_fc"], mlp_params["b_fc"],
            mlp_params["w_proj"], mlp_params["b_proj"], eps,
        )
    return _fused_mlp_vjp(
        x, gamma, beta, mlp_params["w_fc"], mlp_params["b_fc"],
        mlp_params["w_proj"], mlp_params["b_proj"], eps, row_tile, interpret,
    )


def _pick_h_chunk(W: int, H: int, budget_bytes: int = 28 * 2 ** 20) -> int:
    """Largest hidden chunk whose two weight blocks fit the VMEM budget.

    The budget sits under the raised 64M Mosaic scoped-VMEM cap (see
    fused_mha._ATTN_VMEM_LIMIT) — ViT-L/14 (W=1024, H=4096, 16.8M of weights)
    now runs single-chunk, avoiding the per-chunk LN recompute."""
    hc = H
    while hc > 128 and 2 * W * hc * 2 > budget_bytes:
        hc //= 2
    return hc


def _fused_mlp_fwd_impl(x, gamma, beta, w_fc, b_fc, w_proj, b_proj, eps, row_tile, interpret):
    from jax.experimental.pallas import tpu as pltpu_local

    B, T, W = x.shape
    H = w_fc.shape[-1]
    R = B * T
    x2 = x.reshape(R, W)
    dtype = x.dtype
    hc = _pick_h_chunk(W, H)
    while H % hc:
        hc //= 2
    n_chunks = H // hc

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(R // row_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((row_tile, W), lambda i, j: (i, 0)),
            pl.BlockSpec((1, W), lambda i, j: (0, 0)),
            pl.BlockSpec((1, W), lambda i, j: (0, 0)),
            pl.BlockSpec((W, hc), lambda i, j: (0, j)),
            pl.BlockSpec((1, hc), lambda i, j: (0, j)),
            pl.BlockSpec((hc, W), lambda i, j: (j, 0)),
            pl.BlockSpec((1, W), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, W), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, W), dtype),
        scratch_shapes=[pltpu_local.VMEM((row_tile, W), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * W * H,
            bytes_accessed=2 * R * W * x.dtype.itemsize + 2 * W * H * 2,
            transcendentals=R * H,
        ),
        compiler_params=pltpu_local.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20
        ),
        interpret=interpret,
    )(
        x2,
        gamma.astype(jnp.float32).reshape(1, W),
        beta.astype(jnp.float32).reshape(1, W),
        w_fc.astype(dtype),
        b_fc.astype(jnp.float32).reshape(1, H),
        w_proj.astype(dtype),
        b_proj.astype(jnp.float32).reshape(1, W),
    )
    return out.reshape(B, T, W)
