"""Vision saliency: which image patches drove the prediction.

Extends the reference's attribution theme (text-side context-token
attention, ``/root/reference/models/attribution_monitor.py``) to the image
side with the standard ViT explainability readout — the class token's
attention over patches, either from the last layer or via attention
rollout (Abnar & Zuidema 2020: multiply the residual-adjusted,
row-stochastic head-mean maps through the stack).

This is an EXPLAIN path, not a hot path: it re-runs the vision tower in
plain XLA so the full per-layer ``[B, H, T, T]`` probability tensors exist
(the production kernels deliberately never materialize them).  The re-run
is pinned feature-exact against ``clip.encode_image`` in
tests/test_saliency.py, so the maps describe the model that actually
serves.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import layers as L


@functools.lru_cache(maxsize=8)
def _jitted_forward(cfg: CLIPConfig):
    """One dispatch per request: eager per-op dispatch costs ~100 ms each on
    the tunneled TPU, and the un-jitted forward issues hundreds (per-layer
    param slices + block math)."""
    return jax.jit(
        lambda params, images: vision_attention_forward(params, cfg, images)
    )


def vision_attention_forward(
    params, cfg: CLIPConfig, images: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vision tower forward that also returns every layer's attention.

    Returns ``(features [B, embed_dim], probs [n_layers, B, H, T, T])``
    where ``T = 1 + n_patches`` (sublane padding is stripped).  Features
    are identical to ``clip.encode_image`` (same glue, same pre-LN blocks,
    plain-XLA attention — the numerics oracle path).
    """
    if cfg.vision_tower == "resnet":
        raise NotImplementedError(
            "saliency applies to ViT towers only "
            "(the RN-family tower has no patch-token attention)"
        )
    from tapclip_tpu.models.clip import patchify

    p = params["visual"]
    dtype = cfg.compute_dtype
    if images.dtype == jnp.uint8:
        from tapclip_tpu.data.preprocess import device_normalize

        images = device_normalize(images)
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = jnp.dot(
        x, p["patch_embed"]["w"].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)[None]
    vpt_all = None
    if cfg.vpt_tokens > 0:
        # Mirror clip.encode_image's VPT insertion exactly (feature parity
        # is pinned by tests); the prompt slots 1..P are sliced off the
        # saliency rows downstream (patch_saliency).
        vpt_all = p["vpt"].astype(dtype)
        vpt_in = vpt_all[0] if cfg.vpt_deep else vpt_all
        vpt = jnp.broadcast_to(
            vpt_in, (x.shape[0], cfg.vpt_tokens, x.shape[-1])
        )
        x = jnp.concatenate([x[:, :1], vpt, x[:, 1:]], axis=1)
    x = L.layer_norm(x, p["ln_pre"], cfg.ln_eps)

    T = x.shape[1]
    Tp = (T + 7) // 8 * 8
    kv_valid = None
    if Tp != T:
        x = jnp.pad(x, [(0, 0), (0, Tp - T), (0, 0)])
        kv_valid = T

    n_layers = cfg.vision_layers
    blocks = [
        jax.tree.map(lambda a: a[i], p["blocks"]) for i in range(n_layers)
    ]
    all_probs = []
    for i, blk in enumerate(blocks):
        if i > 0 and vpt_all is not None and cfg.vpt_deep:
            # VPT-Deep: fresh prompts at every block input (clip.py's scan
            # applies row i at block i's OUTPUT == block i+1's input).
            x = x.at[:, 1 : 1 + cfg.vpt_tokens, :].set(
                vpt_all[i][None].astype(x.dtype)
            )
        y = L.layer_norm(x, blk["ln_1"], cfg.ln_eps)
        B, Tq, W = y.shape
        H = cfg.vision_heads
        Dh = W // H
        qkv = L.dense(y, blk["attn"]["w_qkv"], blk["attn"]["b_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, Tq, H, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (Dh ** -0.5)
        if kv_valid is not None:
            ki = jnp.arange(Tq)[None, None, None, :]
            logits = jnp.where(
                ki < kv_valid, logits, jnp.finfo(jnp.float32).min
            )
        probs = jax.nn.softmax(logits, axis=-1)
        all_probs.append(probs[:, :, :T, :T])
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, W)
        x = x + L.dense(out, blk["attn"]["w_out"], blk["attn"]["b_out"])
        x = x + L.mlp_forward(
            L.layer_norm(x, blk["ln_2"], cfg.ln_eps), blk["mlp"], cfg.act
        )

    pooled = L.layer_norm(x[:, 0], p["ln_post"], cfg.ln_eps)
    feats = jnp.dot(
        pooled, p["proj"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    return feats, jnp.stack(all_probs)


def attention_rollout(probs: jnp.ndarray) -> jnp.ndarray:
    """Rollout of ``[n_layers, B, H, T, T]`` maps -> ``[B, T, T]``.

    Head-mean per layer, half-residual adjustment ``(A + I) / 2`` (rows
    stay stochastic), then left-multiplied through the stack — row ``q`` of
    the result is where information at ``q`` came from, through all layers.
    """
    A = probs.mean(axis=2)  # [L, B, T, T]
    T = A.shape[-1]
    A = 0.5 * A + 0.5 * jnp.eye(T, dtype=A.dtype)[None, None]

    def step(carry, a):
        return jnp.einsum("bqt,btk->bqk", a, carry), None

    init = jnp.broadcast_to(
        jnp.eye(T, dtype=A.dtype)[None], A.shape[1:]
    )
    out, _ = jax.lax.scan(step, init, A)
    return out


@functools.lru_cache(maxsize=8)
def _jitted_resnet_saliency(cfg: CLIPConfig):
    import jax.nn

    def fwd(params, images):
        """Attnpool attention of the mean-token query over the spatial grid
        — the standard RN-CLIP saliency. Returns (pooled [B, E],
        probs [B, h*w]) with the pooled output exactly matching
        ``resnet_encode_image`` (pinned in tests)."""
        from tapclip_tpu.models.resnet import resnet_feature_map

        if images.dtype == jnp.uint8:
            from tapclip_tpu.data.preprocess import device_normalize

            images = device_normalize(images)
        x = resnet_feature_map(params, cfg, images)
        p = params["visual"]["attnpool"]
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        t = t + p["positional_embedding"].astype(t.dtype)[None]

        def proj(v, pr):
            return (
                jnp.dot(v, pr["w"].astype(v.dtype).T,
                        preferred_element_type=jnp.float32)
                + pr["b"].astype(jnp.float32)
            ).astype(v.dtype)

        n_heads = cfg.vision_width * 32 // 64
        q = proj(t[:, :1], p["q_proj"])
        k = proj(t, p["k_proj"])
        v = proj(t, p["v_proj"])
        Dh = C // n_heads

        def heads(a):
            return a.reshape(B, a.shape[1], n_heads, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (Dh ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1)  # [B, H, 1, HW+1]
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
        pooled = proj(out, p["c_proj"])
        # head-mean query row over the spatial keys (mean-token key dropped)
        return pooled, probs.mean(axis=1)[:, 0, 1:]

    return jax.jit(fwd)


def patch_saliency(
    params, cfg: CLIPConfig, images: jnp.ndarray, method: str = "rollout"
) -> np.ndarray:
    """Class-token saliency over the patch grid -> ``[B, g, g]`` in [0, 1].

    ViT towers: ``method`` is ``"rollout"`` (attention rollout through
    every layer) or ``"last"`` (head-mean class-token row of the final
    layer — the classic "attention map").  RN-family towers: the attnpool
    attention of the mean-token query over the ``image_size // 32`` grid
    (both methods give the same map — there is one attention).
    """
    if method not in ("rollout", "last"):
        raise ValueError(f"unknown saliency method {method!r}")
    if cfg.vision_tower == "resnet":
        _, cls_row = _jitted_resnet_saliency(cfg)(params, images)
        g = cfg.image_size // 32
        grid = np.asarray(cls_row, np.float32).reshape(-1, g, g)
        lo = grid.min(axis=(1, 2), keepdims=True)
        hi = grid.max(axis=(1, 2), keepdims=True)
        return (grid - lo) / np.maximum(hi - lo, 1e-12)
    _, probs = _jitted_forward(cfg)(params, images)
    first_patch = 1 + cfg.vpt_tokens  # skip class token + any VPT prompts
    if method == "rollout":
        cls_row = attention_rollout(probs)[:, 0, first_patch:]  # [B, n_patches]
    else:
        cls_row = probs[-1].mean(axis=1)[:, 0, first_patch:]
    g = cfg.image_size // cfg.patch_size
    grid = np.asarray(cls_row, np.float32).reshape(-1, g, g)
    lo = grid.min(axis=(1, 2), keepdims=True)
    hi = grid.max(axis=(1, 2), keepdims=True)
    return (grid - lo) / np.maximum(hi - lo, 1e-12)
