"""Multi-head attention with an optional attribution aux output.

The reference obtains attention maps by registering a PyTorch forward hook on
the last text block (``/root/reference/models/clip_wrapper.py:29-40``) and then
slices ``attn[:, :prompt_len, T-1]`` in the attribution monitor
(``/root/reference/models/attribution_monitor.py:26-29``).  Hooks are
impossible (and unnecessary) in a functional JAX design: attention here simply
*returns* the head-averaged probability column ``P[:, :, :, eot_idx]`` as an
aux output when asked.  Only a ``[B, T]`` slice is materialized — never the
full ``[B, H, T, T]`` map — matching SURVEY.md §2.2's kernel obligation.

Two implementations share one interface:
  * ``xla``    — plain jnp einsum attention (reference semantics; always
                 available; the numerics oracle for tests).
  * ``pallas`` — fused TPU kernel (``tapclip_tpu.ops.flash_attention``).

Dispatch is via ``multi_head_attention(..., impl=...)``; ``"auto"`` picks
pallas on TPU backends and xla elsewhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _neg_inf(dtype) -> jnp.ndarray:
    return jnp.asarray(jnp.finfo(dtype).min, dtype)


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_valid_len: Optional[jnp.ndarray] = None,
    attn_to_idx: Optional[int] = None,
    softmax_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Plain XLA attention.

    Args:
      q, k, v: ``[B, H, T, Dh]``.
      causal: apply a causal mask (CLIP text tower; the reference's raw
        transformer calls at ``model_wrapper.py:58,72`` pass *no* mask, so the
        ref-compat prompt path uses ``causal=False``).
      kv_valid_len: optional ``[B]`` int array — keys at positions >= the
        valid length are masked out (used for padded sequences).
      attn_to_idx: if set, also return the head-averaged attention probability
        of every query position to key position ``attn_to_idx`` as ``[B, T]``.
      softmax_dtype: dtype for logits/softmax accumulation.

    Returns:
      (out ``[B, H, T, Dh]`` in q.dtype, aux ``[B, T]`` or None).
    """
    B, H, T, Dh = q.shape
    scale = Dh ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=softmax_dtype
    )
    logits = logits.astype(softmax_dtype) * scale

    if causal:
        qi = jnp.arange(T)[:, None]
        ki = jnp.arange(k.shape[2])[None, :]
        logits = jnp.where(ki <= qi, logits, _neg_inf(softmax_dtype))
    if kv_valid_len is not None:
        if isinstance(kv_valid_len, int):
            kv_valid_len = jnp.full((B,), kv_valid_len, jnp.int32)
        ki = jnp.arange(k.shape[2])[None, None, None, :]
        mask = ki < kv_valid_len[:, None, None, None]
        logits = jnp.where(mask, logits, _neg_inf(softmax_dtype))

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=softmax_dtype
    ).astype(q.dtype)

    aux = None
    if attn_to_idx is not None:
        # Head-averaged probability of each query attending to key attn_to_idx
        # — the column the attribution monitor consumes
        # (attribution_monitor.py:26-29 after the head-mean at
        # clip_wrapper.py:36).
        head_mean = probs.mean(axis=1)  # [B, T, Tk]
        if isinstance(attn_to_idx, int):
            aux = head_mean[:, :, attn_to_idx]
        else:
            idx = attn_to_idx.astype(jnp.int32)[:, None, None]  # [B,1,1]
            aux = jnp.take_along_axis(head_mean, idx, axis=2)[:, :, 0]
        aux = aux.astype(softmax_dtype)
    return out, aux


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_valid_len: Optional[jnp.ndarray] = None,
    attn_to_idx: Optional[int] = None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatching attention entry point. Shapes as in attention_reference.

    ``auto`` routing: the Pallas kernel's reason to exist is the attribution
    aux output (materializing only the attention-to-EOT column); when no aux
    is requested, XLA's batched fused attention is faster for CLIP's short
    sequences than a sequential (B, H) kernel grid — so plain attention
    stays on XLA and only aux-bearing calls lower to Pallas.
    """
    if impl == "auto":
        use_pallas = jax.default_backend() == "tpu" and attn_to_idx is not None
        impl = "pallas" if use_pallas else "xla"
    if impl == "xla":
        return attention_reference(
            q, k, v, causal=causal, kv_valid_len=kv_valid_len, attn_to_idx=attn_to_idx
        )
    if impl == "pallas":
        from tapclip_tpu.ops import flash_attention as fa

        return fa.fused_attention(
            q, k, v, causal=causal, kv_valid_len=kv_valid_len, attn_to_idx=attn_to_idx
        )
    raise ValueError(f"unknown attention impl {impl!r}")
