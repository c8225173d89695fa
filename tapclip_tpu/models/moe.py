"""Mixture-of-experts MLP blocks for the transformer towers.

The reference has no MoE (it is a 639-LoC single-GPU prompt tuner); this is
a beyond-reference scaling subsystem in the spirit of LIMoE (Mustafa et al.
2022 — MoE CLIP) built TPU-first:

* **Switch top-1 routing with STATIC capacity** (Fedus et al. 2021): every
  shape in the layer is static, so the whole thing jits into dense einsums
  the MXU eats — no gather/scatter, no dynamic shapes, no host round trips.
* **Dense one-hot dispatch/combine** (the Mesh-TF/ViT-MoE formulation):
  tokens are grouped per sequence (`[B, T]` -> groups of `T`); an expert
  accepts at most ``C = ceil(T/E * capacity_factor)`` tokens per group.
  ``dispatch [B, T, E, C]`` is a 0/1 tensor built from a cumsum over the
  routing one-hot; ``combine = gate * dispatch``.  Overflow tokens get zero
  MLP output and ride the residual unchanged — standard Switch semantics.
* **Expert parallelism as a sharding annotation**: expert weights carry the
  expert axis on the ``"model"`` mesh axis (`parallel/sharding.py`), so the
  per-expert GEMMs are local to their shard and XLA inserts the combine
  reduction over ICI — the same GSPMD mechanism as the Megatron TP rows,
  no manual all-to-all.
* Router math in float32 (softmax + cumsum), expert GEMMs in the compute
  dtype with f32 accumulation — the same precision discipline as the dense
  towers.

The load-balancing auxiliary loss is the Switch one: ``E * sum_e f_e p_e``
(1.0 at perfect balance), averaged over groups, summed over layers by
:func:`moe_transformer_forward` and added to the pretraining objective with
weight ``CLIPConfig.moe_aux_weight``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tapclip_tpu.models import layers

Params = Dict[str, Any]


def expert_capacity(seq_len: int, n_experts: int, capacity_factor: float) -> int:
    """Static per-group capacity: sublane-rounded, never beyond the group.

    The sublane rounding is a perf nicety (aligned [.., C, ..] dims); the
    ``seq_len`` cap is exact — one expert can receive at most the whole
    group, so slots past it are dead weight.
    """
    c = int(-(-seq_len * capacity_factor // n_experts))  # ceil
    c = -(-c // 8) * 8  # round up to a sublane multiple
    return max(min(c, seq_len), min(8, seq_len))


def init_moe_mlp(key, width: int, hidden: int, n_experts: int) -> Params:
    kr, k1, k2 = jax.random.split(key, 3)
    return {
        "router": {
            # Small-variance router init: near-uniform initial routing.
            "w": jax.random.normal(kr, (width, n_experts), jnp.float32) * 0.02,
        },
        "w_fc": jax.random.normal(k1, (n_experts, width, hidden), jnp.float32)
        * (width ** -0.5),
        "b_fc": jnp.zeros((n_experts, hidden), jnp.float32),
        "w_proj": jax.random.normal(k2, (n_experts, hidden, width), jnp.float32)
        * (hidden ** -0.5),
        "b_proj": jnp.zeros((n_experts, width), jnp.float32),
    }


def init_moe_block(key, width: int, n_experts: int, mlp_ratio: int = 4) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ln_1": layers.init_layer_norm(width),
        "attn": layers.init_attn(k1, width),
        "ln_2": layers.init_layer_norm(width),
        "moe": init_moe_mlp(k2, width, mlp_ratio * width, n_experts),
    }


def init_moe_blocks(
    key, n_layers: int, width: int, n_experts: int, mlp_ratio: int = 4
) -> Params:
    """Stacked MoE block params (leading ``[n_layers]`` axis, like
    ``layers.init_blocks``) — scannable and shardable per leaf."""
    keys = jax.random.split(key, n_layers)
    per_layer = [init_moe_block(k, width, n_experts, mlp_ratio) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def moe_mlp_forward(
    x: jnp.ndarray,
    p: Params,
    act: str,
    *,
    capacity_factor: float = 1.25,
    valid_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 MoE MLP over ``x [B, T, W]`` -> (out ``[B, T, W]``, lb loss).

    Dropped (over-capacity) tokens produce exactly zero output.  The
    returned load-balance term is the Switch ``E * sum_e f_e p_e`` averaged
    over the ``B`` groups.

    ``valid_len`` (static): the towers pad T to a sublane multiple with
    zero rows — those pads must not route (a zero row ties the softmax and
    argmax picks expert 0, skewing ``f_0``, eating capacity, and biasing
    the load-balance gradient).  Tokens at positions >= valid_len are
    masked out of dispatch AND the f/p statistics, and produce zero output
    (their residual passes through like a dropped token).
    """
    B, T, W = x.shape
    E = p["w_fc"].shape[0]
    C = expert_capacity(valid_len or T, E, capacity_factor)
    dtype = x.dtype

    logits = jnp.dot(
        x.astype(jnp.float32), p["router"]["w"], preferred_element_type=jnp.float32
    )  # [B, T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)  # [B, T]
    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # [B, T, E]
    n_valid = T
    if valid_len is not None and valid_len < T:
        valid = (jnp.arange(T) < valid_len).astype(jnp.float32)  # [T]
        onehot = onehot * valid[None, :, None]
        probs = probs * valid[None, :, None]  # for p_bar only (see below)
        n_valid = valid_len
    gate = jnp.sum(probs * onehot, axis=-1)  # [B, T]

    # Position of each token within its expert's queue (0-based), per group.
    pos = jnp.cumsum(onehot, axis=1) * onehot - onehot  # [B, T, E]
    keep = (pos < C).astype(jnp.float32) * onehot
    pos_oh = jax.nn.one_hot(
        pos.astype(jnp.int32), C, dtype=jnp.float32
    )  # [B, T, E, C]
    dispatch = pos_oh * keep[..., None]  # [B, T, E, C], 0/1
    combine = dispatch * gate[..., None, None]  # [B, T, E, C]

    # Dispatch -> per-expert batches [B, E, C, W]; batched expert GEMMs;
    # combine back. All dense, all static — the TPU-native MoE data path.
    xin = jnp.einsum(
        "btec,btw->becw", dispatch.astype(dtype), x,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    h = jnp.einsum(
        "becw,ewh->bech", xin, p["w_fc"].astype(dtype),
        preferred_element_type=jnp.float32,
    ) + p["b_fc"][None, :, None, :]
    h = layers._ACTS[act](h.astype(dtype))
    out = jnp.einsum(
        "bech,ehw->becw", h, p["w_proj"].astype(dtype),
        preferred_element_type=jnp.float32,
    ) + p["b_proj"][None, :, None, :]
    y = jnp.einsum(
        "btec,becw->btw", combine.astype(jnp.float32), out.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    # Switch load balance over VALID tokens only: f_e = routed fraction,
    # p_e = mean router prob.
    f = jnp.sum(onehot, axis=1) / n_valid  # [B, E]
    pbar = jnp.sum(probs, axis=1) / n_valid  # [B, E]
    lb = E * jnp.mean(jnp.sum(f * pbar, axis=-1))
    return y, lb


def moe_block_forward(
    x: jnp.ndarray,
    p: Params,
    n_heads: int,
    *,
    act: str,
    ln_eps: float = 1e-5,
    causal: bool = False,
    kv_valid_len=None,
    impl: str = "auto",
    capacity_factor: float = 1.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-LN residual block with an MoE MLP half.  The attention half runs
    the split composition (XLA GEMMs + the packed-QKV fused core on TPU via
    ``layers.attn_forward``) — the monolithic fused-block kernel is a
    dense-MLP fusion and does not apply here."""
    h, _ = layers.attn_forward(
        layers.layer_norm(x, p["ln_1"], ln_eps),
        p["attn"],
        n_heads,
        causal=causal,
        kv_valid_len=kv_valid_len,
        impl=impl,
    )
    x = x + h
    y, lb = moe_mlp_forward(
        layers.layer_norm(x, p["ln_2"], ln_eps),
        p["moe"],
        act,
        capacity_factor=capacity_factor,
        # static tower-level pad length: keep pad rows out of routing
        valid_len=kv_valid_len if isinstance(kv_valid_len, int) else None,
    )
    return x + y, lb


def moe_transformer_forward(
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
    capacity_factor: float = 1.25,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan the stacked MoE blocks.

    Signature-compatible with ``layers.transformer_forward`` (the extra
    kwargs are accepted and validated) so the tower encoders can route here.
    The second return mirrors the dense tower's contract:

    * ``attn_to_idx is None`` (pretraining / encoding): the layer-summed
      load-balance loss (a scalar) — surfaced via the encoders'
      ``moe_loss_out``;
    * ``attn_to_idx`` given (the attribution pass of prompt tuning): the
      last block's attention aux ``[B, T]``, exactly like
      ``transformer_forward`` — so the full TAP-CLIP prompt-tuning pipeline
      runs on MoE towers.  The lb loss is dropped here by design: prompt
      tuning freezes the towers, so the router never trains and the aux
      loss is moot.
    """
    if quantize:
        raise NotImplementedError("int8 quantization of MoE towers")

    body = functools.partial(
        moe_block_forward,
        n_heads=n_heads,
        act=act,
        ln_eps=ln_eps,
        causal=causal,
        kv_valid_len=kv_valid_len,
        impl=impl,
        capacity_factor=capacity_factor,
    )

    def scan_step(carry, layer_params):
        y, acc = carry
        if act_sharding is not None:
            y = jax.lax.with_sharding_constraint(y, act_sharding)
        y, lb = body(y, layer_params)
        return (y, acc + lb), None

    if remat == "dots":
        scan_step = jax.checkpoint(
            scan_step,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat == "full":
        scan_step = jax.checkpoint(scan_step)
    elif remat != "none":
        raise ValueError(f"unknown remat policy {remat!r}")

    n_layers = _num_layers_moe(blocks)

    if attn_to_idx is None:
        (x, lb_sum), _ = jax.lax.scan(
            scan_step, (x, jnp.zeros((), jnp.float32)), blocks,
            unroll=max(1, min(unroll, n_layers)),
        )
        return x, lb_sum

    # Attribution path (reference hooks resblocks[-1].attn,
    # clip_wrapper.py:39): run the last block outside the scan with the aux
    # column, mirroring layers.transformer_forward.
    lb_sum = jnp.zeros((), jnp.float32)
    if n_layers > 1:
        head = jax.tree.map(lambda a: a[:-1], blocks)
        (x, lb_sum), _ = jax.lax.scan(
            scan_step, (x, lb_sum), head,
            unroll=max(1, min(unroll, n_layers - 1)),
        )
    last = jax.tree.map(lambda a: a[-1], blocks)
    h, aux = layers.attn_forward(
        layers.layer_norm(x, last["ln_1"], ln_eps),
        last["attn"],
        n_heads,
        causal=causal,
        kv_valid_len=kv_valid_len,
        attn_to_idx=attn_to_idx,
        impl=impl,
    )
    x = x + h
    y, _ = moe_mlp_forward(
        layers.layer_norm(x, last["ln_2"], ln_eps),
        last["moe"],
        act,
        capacity_factor=capacity_factor,
        valid_len=kv_valid_len if isinstance(kv_valid_len, int) else None,
    )
    return x + y, aux


def _num_layers_moe(blocks: Params) -> int:
    return jax.tree.leaves(blocks)[0].shape[0]
