"""Parameter-efficient fine-tuning: LoRA adapters for the CLIP towers.

The reference freezes the towers entirely and trains only prompt vectors
(`/root/reference/train.py:65-67`); full-tower pretraining (`pretrain.py`)
trains everything.  LoRA (Hu et al. 2021) is the standard middle point —
rank-r updates on the big GEMM weights — and the TPU-native formulation
here is *merge-then-run*:

    W' = W + (alpha / r) * A @ B

merged once per step for every adapted weight, after which the towers run
completely unchanged — every fused Pallas kernel, every sharding spec, and
every config knob (remat, scan_unroll, attn_impl) applies to the merged
tree as-is.  Gradients flow through the merge back to (A, B) only, so the
optimizer state is O(r·W) instead of O(W²)-ish full fine-tuning.

Why merge-then-run instead of the usual y += (x@A)@B side-path: the fused
attention/MLP block kernels consume packed weights; a side-path would
bypass them (or require kernel surgery), while the merge is a handful of
[W, r] x [r, O] GEMMs per layer — for ViT-B, ~0.2% of a step's FLOPs —
and keeps the hot path byte-identical to pretraining.  Under `jit` the
merge fuses into the step; under a mesh the merged tree inherits the base
tree's GSPMD shardings.

Adapted leaves: every stacked block GEMM — `attn/w_qkv`, `attn/w_out`,
`mlp/w_fc`, `mlp/w_proj` (dense towers; MoE expert banks adapt per-expert
with the same rule, the rank axis broadcasting over `E`).  Embeddings,
layernorms, and projections stay frozen (standard LoRA practice).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tapclip_tpu.config import CLIPConfig

Params = Dict[str, Any]

# Leaf names (within a block pytree) that receive adapters, dense + MoE.
_ADAPTED = ("w_qkv", "w_out", "w_fc", "w_proj")


def _is_adapted_path(path: Tuple) -> bool:
    keys = [getattr(k, "key", None) for k in path]
    return (
        "blocks" in keys
        and keys[-1] in _ADAPTED
        # MoE router stays frozen (tiny, and routing shifts destabilize
        # fine-tuning); expert banks are adapted.
        and "router" not in keys
    )


def init_lora_params(
    key: jax.Array, clip_params: Params, rank: int = 8
) -> Params:
    """A/B trees mirroring the adapted leaves of ``clip_params``.

    A ~ N(0, 1/r) on the input side, B = 0 (standard init: the adapter
    starts as an exact no-op, so step 0 reproduces the base model).
    For a weight ``[..., In, Out]`` (leading layer/expert axes kept):
    A is ``[..., In, r]``, B is ``[..., r, Out]``.
    """
    leaves = []

    def make(path, leaf):
        if not _is_adapted_path(path):
            return None
        *lead, n_in, n_out = leaf.shape
        leaves.append((tuple(lead), n_in, n_out))
        return leaf.shape

    shapes = jax.tree_util.tree_map_with_path(make, clip_params)
    keys = iter(jax.random.split(key, max(len(leaves), 1)))

    def build(path, leaf):
        if not _is_adapted_path(path):
            return None
        *lead, n_in, n_out = leaf.shape
        k = next(keys)
        return {
            "a": jax.random.normal(k, (*lead, n_in, rank), jnp.float32)
            * (rank ** -0.5),
            "b": jnp.zeros((*lead, rank, n_out), jnp.float32),
        }

    del shapes
    return jax.tree_util.tree_map_with_path(build, clip_params)


def merge_lora(
    clip_params: Params, lora: Params, alpha: float = 16.0
) -> Params:
    """``W + (alpha / r) * A @ B`` on every adapted leaf (others pass
    through).  Runs under jit inside the fine-tune step; gradients flow to
    (A, B) through the merge."""

    def merge(path, w, ab):
        if ab is None:
            return w
        rank = ab["a"].shape[-1]
        scale = alpha / rank
        delta = jnp.matmul(
            ab["a"], ab["b"], preferred_element_type=jnp.float32
        )
        return (w.astype(jnp.float32) + scale * delta).astype(w.dtype)

    return jax.tree_util.tree_map_with_path(
        merge, clip_params, lora, is_leaf=lambda x: x is None
    )


def lora_param_count(lora: Params) -> int:
    return sum(
        int(x.size) for x in jax.tree.leaves(lora) if hasattr(x, "size")
    )


def make_lora_pretrain_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    loss: str = "infonce",
    alpha: float = 16.0,
) -> Callable:
    """Contrastive fine-tuning step that trains ONLY the LoRA trees
    (``logit_scale`` and all base weights stay frozen): signature
    ``step(clip_params, lora, opt_state, images, token_ids)`` ->
    ``(lora, opt_state, metrics)``.

    Reuses the pretraining losses (InfoNCE / SigLIP, local or
    mesh-sharded) on the merged tree — every kernel and sharding behaves
    exactly as in full pretraining.
    """
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.pretrain import (
        contrastive_loss_global,
        contrastive_loss_local,
        siglip_loss_global,
        siglip_loss_local,
    )
    from tapclip_tpu.parallel.mesh import DATA_AXIS

    if loss not in ("infonce", "siglip"):
        raise ValueError(f"unknown loss {loss!r}")

    def loss_fn(lora, clip_params, images, token_ids):
        moe_losses = []
        merged = merge_lora(clip_params, lora, alpha=alpha)
        img = clip_model.encode_image(
            merged, cfg, images, moe_loss_out=moe_losses
        )
        txt = clip_model.encode_text(
            merged, cfg, token_ids, moe_loss_out=moe_losses
        )
        scale = merged["logit_scale"]
        sharded = mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1
        if loss == "siglip":
            bias = merged["logit_bias"]
            if sharded:
                total = siglip_loss_global(img, txt, scale, bias, mesh)
            else:
                total = siglip_loss_local(img, txt, scale, bias)
        elif sharded:
            total = contrastive_loss_global(img, txt, scale, mesh)
        else:
            total = contrastive_loss_local(img, txt, scale)
        if moe_losses:
            total = total + cfg.moe_aux_weight * sum(moe_losses)
        return total

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(clip_params, lora, opt_state, images, token_ids):
        lval, grads = jax.value_and_grad(loss_fn)(
            lora, clip_params, images, token_ids
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, {"loss": lval}

    return step
