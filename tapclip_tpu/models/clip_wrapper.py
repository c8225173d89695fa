"""CLIPWrapper — API-parity shim over the functional CLIP model.

The reference's L1 interface (``/root/reference/models/clip_wrapper.py``):
``encode_image`` (:46), ``encode_text`` (:49), ``get_attention_map`` (:53),
``reset`` (:42), ``get_tokenizer`` (:61), ``get_preprocess`` (:64).

In the functional TPU design attention maps are *returned*, not captured by
hooks; this wrapper preserves the imperative API for drop-in use: the last
``encode_text`` call records the final text layer's head-averaged attention
map, retrievable via ``get_attention_map()`` (shape ``[B, T, T]``).

Note on the reference's actual hook behavior: open_clip calls
``nn.MultiheadAttention`` with ``need_weights=False``, so ``output[0]`` in the
reference hook (``clip_wrapper.py:34``) is the attention *output*
``[B, T, E]``, not the weights the code's comment claims — the downstream
attribution slice degenerates.  We implement the documented intent (the
``[B, H, T, T]`` probability map, head-averaged), matching SURVEY.md §2.1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models import layers


def last_layer_attention_map(
    params, cfg: CLIPConfig, embeds: jnp.ndarray, *, causal: bool = False
) -> jnp.ndarray:
    """Full head-averaged last-layer attention probabilities ``[B, T, T]``.

    Debug/compat path only — the hot path materializes just the attribution
    column via the fused kernel's aux output.
    """
    blocks = params["text"]["blocks"]
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    x = embeds.astype(cfg.compute_dtype)
    for i in range(n_layers - 1):
        blk = jax.tree.map(lambda a: a[i], blocks)
        x, _ = layers.block_forward(
            x, blk, cfg.text_heads, act=cfg.act, ln_eps=cfg.ln_eps, causal=causal,
            impl="xla",
        )
    last = jax.tree.map(lambda a: a[-1], blocks)
    y = layers.layer_norm(x, last["ln_1"], cfg.ln_eps)
    B, T, W = y.shape
    H = cfg.text_heads
    qkv = y @ last["attn"]["w_qkv"].astype(y.dtype) + last["attn"]["b_qkv"].astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, H, W // H).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) * ((W // H) ** -0.5)
    if causal:
        qi = jnp.arange(T)[:, None]
        ki = jnp.arange(T)[None, :]
        logits = jnp.where(ki <= qi, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return probs.mean(axis=1)  # head-mean, clip_wrapper.py:36


class CLIPWrapper:
    """Imperative-API wrapper (reference ``CLIPWrapper`` drop-in)."""

    def __init__(
        self,
        model_name: str = "ViT-B-32",
        pretrained_path: Optional[str] = None,
        device: Optional[str] = None,  # accepted for parity; unused
        *,
        cfg: Optional[CLIPConfig] = None,
        bpe_path: Optional[str] = None,
        rng_seed: int = 0,
    ):
        from tapclip_tpu.config import MODEL_PRESETS
        from tapclip_tpu.data.preprocess import make_preprocess
        from tapclip_tpu.data.tokenizer import get_tokenizer

        self.cfg = cfg or MODEL_PRESETS[model_name]
        if pretrained_path:
            from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

            self.params = jax.tree.map(
                jnp.asarray, load_openclip_checkpoint(pretrained_path, self.cfg)
            )
        else:
            self.params = clip_model.init_clip_params(
                jax.random.PRNGKey(rng_seed), self.cfg
            )
        self.tokenizer = get_tokenizer(bpe_path, self.cfg.context_length)
        self.preprocess = make_preprocess(self.cfg.image_size)
        self._attention_map = None

    # -- reference API -------------------------------------------------------

    def reset(self):  # clip_wrapper.py:42
        self._attention_map = None

    def encode_image(self, images) -> jnp.ndarray:  # clip_wrapper.py:46
        return clip_model.encode_image(self.params, self.cfg, jnp.asarray(images))

    def encode_text(self, token_ids) -> jnp.ndarray:  # clip_wrapper.py:49
        self.reset()
        ids = jnp.asarray(token_ids)
        x = clip_model.embed_tokens(self.params, self.cfg, ids)
        x = x + self.params["text"]["positional_embedding"][None].astype(x.dtype)
        self._attention_map = last_layer_attention_map(
            self.params, self.cfg, x, causal=True
        )
        return clip_model.encode_text(self.params, self.cfg, ids)

    def transformer_raw(self, embeds) -> jnp.ndarray:
        """The reference's bare ``model.transformer(x)`` call
        (model_wrapper.py:58,72): no pos emb, no mask; records the map."""
        embeds = jnp.asarray(embeds)
        self._attention_map = last_layer_attention_map(
            self.params, self.cfg, embeds, causal=False
        )
        feats, _ = clip_model.text_forward_embeds(
            self.params, self.cfg, embeds, mode="ref_compat", pool_idx=None
        )
        return feats

    def get_attention_map(self):  # clip_wrapper.py:53-59
        return self._attention_map

    def get_tokenizer(self):  # clip_wrapper.py:61
        return self.tokenizer

    def get_preprocess(self):  # clip_wrapper.py:64
        return self.preprocess
