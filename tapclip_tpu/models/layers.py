"""Functional transformer building blocks.

Pure functions over explicit param pytrees (nested dicts of jnp arrays) — the
TPU-native replacement for the torch ``nn.Module`` graph the reference wraps.
Params are stored in float32; compute runs in a configurable dtype (bf16 on
TPU) with layernorm/softmax accumulation in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tapclip_tpu.ops.attention import multi_head_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (CLIP-style)
# ---------------------------------------------------------------------------


def init_layer_norm(width: int) -> Params:
    return {"scale": jnp.ones((width,), jnp.float32), "bias": jnp.zeros((width,), jnp.float32)}


def init_attn(key, width: int) -> Params:
    k1, k2 = jax.random.split(key)
    std = width ** -0.5
    return {
        "w_qkv": jax.random.normal(k1, (width, 3 * width), jnp.float32) * std,
        "b_qkv": jnp.zeros((3 * width,), jnp.float32),
        "w_out": jax.random.normal(k2, (width, width), jnp.float32) * std,
        "b_out": jnp.zeros((width,), jnp.float32),
    }


def init_mlp(key, width: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "w_fc": jax.random.normal(k1, (width, hidden), jnp.float32) * (width ** -0.5),
        "b_fc": jnp.zeros((hidden,), jnp.float32),
        "w_proj": jax.random.normal(k2, (hidden, width), jnp.float32) * (hidden ** -0.5),
        "b_proj": jnp.zeros((width,), jnp.float32),
    }


def init_block(key, width: int, mlp_ratio: int = 4) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ln_1": init_layer_norm(width),
        "attn": init_attn(k1, width),
        "ln_2": init_layer_norm(width),
        "mlp": init_mlp(k2, width, mlp_ratio * width),
    }


def init_blocks(key, n_layers: int, width: int, mlp_ratio: int = 4) -> Params:
    """Stacked block params: every leaf gets a leading [n_layers] axis.

    Stacking enables ``lax.scan`` over layers (one trace instead of L) and a
    single sharding annotation per leaf.
    """
    keys = jax.random.split(key, n_layers)
    per_layer = [init_block(k, width, mlp_ratio) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"gelu": functools.partial(jax.nn.gelu, approximate=False), "quick_gelu": quick_gelu}


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``[..., In] @ [In, Out]`` with f32 accumulation.

    Kept as a direct N-D contraction: measured on v5e (ViT-B/16 bs=256),
    XLA's native lowering of the 3-D dot (a convolution-style emitter) beats
    both an explicit ``[B*T, In]`` flatten (relayout copies when T is not a
    sublane multiple: 1670 img/s) and flatten+sequence-padding-to-8 with
    masked attention (1917 img/s) vs 2081 img/s for this form.
    """
    dtype = x.dtype
    y = jnp.dot(x, w.astype(dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)


def mlp_forward(x: jnp.ndarray, p: Params, act: str) -> jnp.ndarray:
    h = _ACTS[act](dense(x, p["w_fc"], p["b_fc"]))
    return dense(h, p["w_proj"], p["b_proj"])


def attn_forward(
    x: jnp.ndarray,
    p: Params,
    n_heads: int,
    *,
    causal: bool = False,
    kv_valid_len=None,
    attn_to_idx=None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused-QKV multi-head self attention over ``x [B, T, W]``."""
    B, T, W = x.shape
    dtype = x.dtype
    Dh = W // n_heads
    qkv = dense(x, p["w_qkv"], p["b_qkv"])

    resolved = impl
    if resolved in ("auto", "fused_split"):
        import jax as _jax

        if _jax.default_backend() == "tpu":
            if attn_to_idx is not None:
                resolved = "pallas"  # needs the attribution aux column
            elif kv_valid_len is None or isinstance(kv_valid_len, int):
                # Packed-QKV fast path; causal (text tower) included — the
                # kernel masks k > q, and its dedicated backward avoids the
                # [B, H, T, T] probability tensor XLA's autodiff saves to
                # HBM (the dominant text-side cost in full-tower training).
                resolved = "fused"
            else:
                resolved = "xla"
        else:
            resolved = "xla"

    if resolved == "fused":
        from tapclip_tpu.ops.fused_mha import fused_mha

        out = fused_mha(qkv, n_heads, valid_len=kv_valid_len, causal=causal)
        return dense(out, p["w_out"], p["b_out"]), None

    q, k, v = jnp.split(qkv, 3, axis=-1)

    # NOTE: a transpose-free [B,T,H,Dh] einsum variant ("bqhd,bkhd->bhqk")
    # was measured ~2x SLOWER end-to-end on v5e (230 vs 123 ms/step at
    # ViT-B/16 bs=256) — XLA's layouts for the explicit-transpose form win.
    def heads(t):  # [B, T, W] -> [B, H, T, Dh]
        return t.reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)

    out, aux = multi_head_attention(
        heads(q),
        heads(k),
        heads(v),
        causal=causal,
        kv_valid_len=kv_valid_len,
        attn_to_idx=attn_to_idx,
        impl=resolved,
    )
    out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
    return dense(out, p["w_out"], p["b_out"]), aux


def block_forward(
    x: jnp.ndarray,
    p: Params,
    n_heads: int,
    *,
    act: str,
    ln_eps: float = 1e-5,
    causal: bool = False,
    kv_valid_len=None,
    attn_to_idx=None,
    impl: str = "auto",
    quantize: bool = False,
    quantize_deterministic: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pre-LN residual attention block (open_clip ResidualAttentionBlock)."""
    # "fused_split": XLA GEMMs for qkv/out-proj + the fused_mha kernel for
    # the attention core (better for very wide models where the monolithic
    # block kernel is forced down to batch-block 1 by VMEM).
    use_fused_block = False
    if (
        impl in ("auto", "fused")
        and attn_to_idx is None
        and not causal
        and (kv_valid_len is None or isinstance(kv_valid_len, int))
    ):
        # Causal blocks deliberately stay OFF the monolithic kernel: at text
        # geometry (T=80, W=512) it measured 3.5x slower than the XLA
        # GEMM composition (1.31 vs 0.37 ms/block on v5e) — small [T, T]
        # tiles starve the MXU. The causal path routes through attn_forward
        # below, where the packed-QKV fused_mha CORE (with its dedicated
        # causal backward) still carries the attention math.
        import jax as _jax

        use_fused_block = _jax.default_backend() == "tpu"
        if use_fused_block:
            # Very wide models force the monolithic kernel down to batch
            # block 1; the split path (XLA GEMMs + fused_mha core) measured
            # faster there (ViT-L/14: 762 vs 745 img/s).
            from tapclip_tpu.ops.fused_mha import _pick_attn_block_b

            B_, T_, W_ = x.shape
            if _pick_attn_block_b(B_, T_, W_, 8) == 1:
                use_fused_block = False

    quantize_attn = (
        quantize
        and attn_to_idx is None
        and not causal
        and (kv_valid_len is None or isinstance(kv_valid_len, int))
    )
    if quantize_attn:
        # int8 W8A8 qkv/out-proj (eval-only, like the int8 MLP below).
        # Routed INDEPENDENTLY of use_fused_block (the fused-vs-split
        # heuristic above never changes whether int8 runs). Numerics still
        # differ by platform/shape: on TPU the Pallas kernel uses stochastic
        # rounding for activations, while off-TPU — and for shapes the fused
        # int8 block rejects (e.g. B*T % 32 != 0) — the deterministic XLA
        # model runs instead. CLIPConfig.int8_deterministic forces the
        # deterministic model everywhere (reproducible production scoring).
        from tapclip_tpu.ops.int8_attn import int8_attn_block

        x = int8_attn_block(
            x, p["ln_1"], p["attn"], n_heads, valid_len=kv_valid_len, eps=ln_eps,
            deterministic=quantize_deterministic,
        )
        aux = None
    elif use_fused_block:
        from tapclip_tpu.ops.fused_mha import fused_attn_block

        x = fused_attn_block(
            x, p["ln_1"], p["attn"], n_heads, valid_len=kv_valid_len,
            eps=ln_eps, causal=causal,
        )
        aux = None
    else:
        h, aux = attn_forward(
            layer_norm(x, p["ln_1"], ln_eps),
            p["attn"],
            n_heads,
            causal=causal,
            kv_valid_len=kv_valid_len,
            attn_to_idx=attn_to_idx,
            impl=impl,
        )
        x = x + h

    if quantize and act == "gelu":
        # int8 W8A8 eval path (CLIPConfig.quantize_tower). No VJP by design:
        # differentiating through it fails loudly rather than silently
        # training against quantization noise.
        from tapclip_tpu.ops.int8_mlp import int8_mlp_block

        return (
            int8_mlp_block(
                x, p["ln_2"], p["mlp"], eps=ln_eps,
                deterministic=quantize_deterministic,
            ),
            aux,
        )

    use_fused_mlp = False
    if act == "gelu" and impl in ("auto", "fused", "fused_split"):
        import jax as _jax

        use_fused_mlp = _jax.default_backend() == "tpu"
    if use_fused_mlp:
        from tapclip_tpu.ops.fused_mlp import fused_mlp_block

        x = fused_mlp_block(x, p["ln_2"], p["mlp"], eps=ln_eps)
    else:
        x = x + mlp_forward(layer_norm(x, p["ln_2"], ln_eps), p["mlp"], act)
    return x, aux


def transformer_forward(
    x: jnp.ndarray,
    blocks: Params,
    n_heads: int,
    *,
    act: str,
    ln_eps: float = 1e-5,
    causal: bool = False,
    kv_valid_len=None,
    attn_to_idx=None,
    impl: str = "auto",
    quantize: bool = False,
    quantize_deterministic: bool = False,
    remat: str = "none",
    act_sharding=None,
    unroll: int = 1,
    layer_prompts=None,
    prompt_offset: int = 1,
    prompt_mask=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run stacked transformer blocks via ``lax.scan``.

    ``layer_prompts`` (VPT-Deep / MaPLe, ``[n_layers-1, P, W]``): row ``i``
    overwrites token slots ``prompt_offset..prompt_offset+P`` of block
    ``i``'s OUTPUT — i.e. block ``i+1`` sees fresh learned prompts at its
    input (the caller inserts layer 0's prompts before the stack).  The
    final block's output is never overwritten.  ``prompt_mask``
    (``[n_layers-1]`` bool) deactivates rows per layer (MaPLe's prompt
    depth J < n_layers: rows >= J-1 are inert and the last inserted
    prompts' outputs propagate as ordinary tokens); ``None`` means all
    rows active.  ``prompt_offset`` is 1 for vision towers (slot 0 is the
    class token) and 0/1 for ref_compat/idiomatic text sequences.

    The attribution aux output (attention-to-EOT column) is taken from the
    *last* block only — the reference hooks ``resblocks[-1].attn``
    (``clip_wrapper.py:39``).  The last layer therefore runs outside the scan.

    ``remat`` ("none" | "dots" | "full") applies per-block gradient
    checkpointing (``CLIPConfig.remat``): under grad, "full" saves only each
    block's input and recomputes the block in the backward pass; "dots"
    additionally saves matmul outputs.  Numerics are identical; only the
    FLOPs/memory trade changes.

    ``act_sharding`` (a ``NamedSharding``, typically ``[B, T, W]`` ->
    ``P("data", "model", None)``) pins the *inter-block activation* layout —
    Megatron-style sequence parallelism: under tensor parallelism GSPMD then
    keeps layernorm/residual/elementwise work sharded along T over the
    ``model`` axis and splits each block's TP all-reduce into
    reduce-scatter + all-gather pairs at the block boundaries.  Numerically
    a no-op (it is only a layout constraint).
    """
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    unroll = max(1, min(unroll, n_layers))
    body = functools.partial(
        block_forward,
        n_heads=n_heads,
        act=act,
        ln_eps=ln_eps,
        causal=causal,
        kv_valid_len=kv_valid_len,
        impl=impl,
        quantize=quantize,
        quantize_deterministic=quantize_deterministic,
    )

    def scan_step(carry, layer_params):
        if act_sharding is not None:
            carry = jax.lax.with_sharding_constraint(carry, act_sharding)
        y, _ = body(carry, layer_params)
        return y, None

    def _with_remat(f):
        if remat == "dots":
            return jax.checkpoint(
                f,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        if remat == "full":
            return jax.checkpoint(f)
        if remat != "none":
            raise ValueError(f"unknown remat policy {remat!r}")
        return f

    scan_step = _with_remat(scan_step)

    if layer_prompts is not None:
        n_prompts = layer_prompts.shape[1]
        if prompt_mask is None:
            prompt_mask = jnp.ones((layer_prompts.shape[0],), bool)

        def scan_step_deep(carry, xs):
            layer_params, prompts, active = xs
            if act_sharding is not None:
                carry = jax.lax.with_sharding_constraint(carry, act_sharding)
            y, _ = body(carry, layer_params)
            overwritten = y.at[
                :, prompt_offset : prompt_offset + n_prompts, :
            ].set(prompts[None].astype(y.dtype))
            y = jnp.where(active, overwritten, y)
            return y, None

        scan_step_deep = _with_remat(scan_step_deep)
        if n_layers > 1:
            head_blocks = jax.tree.map(lambda a: a[:-1], blocks)
            x, _ = jax.lax.scan(
                scan_step_deep,
                x,
                (head_blocks, layer_prompts, prompt_mask),
                unroll=unroll,
            )
        last = jax.tree.map(lambda a: a[-1], blocks)
        x, aux = body(x, last, attn_to_idx=attn_to_idx)
        return x, aux

    if attn_to_idx is None:
        # No aux needed: scan over ALL layers (one trace, smaller program).
        x, _ = jax.lax.scan(scan_step, x, blocks, unroll=unroll)
        return x, None

    if n_layers > 1:
        head_blocks = jax.tree.map(lambda a: a[:-1], blocks)
        x, _ = jax.lax.scan(scan_step, x, head_blocks, unroll=unroll)

    last = jax.tree.map(lambda a: a[-1], blocks)
    x, aux = body(x, last, attn_to_idx=attn_to_idx)
    return x, aux
