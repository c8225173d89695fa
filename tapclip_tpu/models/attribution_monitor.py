"""Attribution monitor: context-token attribution from attention.

Pure-function rebuild of ``/root/reference/models/attribution_monitor.py``.
The reference slices ``attn_map[:, :prompt_len, T-1]`` — each context token's
attention to the last sequence position — and softmax-normalizes over the
prompt dimension (``attribution_monitor.py:26-34``).

In the TPU design the attention column arrives directly from the fused
attention kernel as a ``[N, T]`` aux output (head-averaged attention of every
query to the EOT/last key), so this function only does the slice + softmax.

Note: the index ``T-1`` lands on a padding slot of the 82-token concatenated
sequence, not the EOT token; the reference's comment calls it the "class
token at the end" but we replicate the *index choice*, not the comment
(SURVEY.md §2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attribution_scores(
    attn_col: jnp.ndarray,
    prompt_len: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """``attn_col [N, T]`` (attention-to-EOT column) -> ``[N, prompt_len]``."""
    raw = attn_col[:, :prompt_len]
    if normalize:
        return jax.nn.softmax(raw.astype(jnp.float32), axis=-1)
    return raw.astype(jnp.float32)


def attribution_entropy(attribution: jnp.ndarray) -> jnp.ndarray:
    """Mean entropy of attribution rows (eval_metrics.py:76-81)."""
    eps = 1e-8
    p = attribution + eps
    return (-(p * jnp.log(p)).sum(axis=-1)).mean()


def attribution_variance(
    attribution: jnp.ndarray, labels: jnp.ndarray, n_classes=None
) -> jnp.ndarray:
    """Mean per-label variance of attribution (eval_metrics.py:84-96).

    Segment-reduced version of the reference's Python group-by; labels out of
    range contribute nothing.  ``n_classes`` defaults to ``max(labels)+1``
    (matching the reference's 2-arg signature); pass it explicitly under jit,
    where the inferred value would be data-dependent.
    """
    if n_classes is None:
        n_classes = int(labels.max()) + 1
    one_hot = jax.nn.one_hot(labels, n_classes, dtype=attribution.dtype)  # [N, C]
    counts = one_hot.sum(axis=0)  # [C]
    safe = jnp.maximum(counts, 1.0)
    mean = jnp.einsum("nc,np->cp", one_hot, attribution) / safe[:, None]
    sq = jnp.einsum("nc,np->cp", one_hot, attribution ** 2) / safe[:, None]
    # torch .var() default is the unbiased estimator (ddof=1).
    var = (sq - mean ** 2) * (safe / jnp.maximum(safe - 1.0, 1.0))[:, None]
    present = counts > 0
    per_class = var.mean(axis=-1)
    return jnp.where(present, per_class, 0.0).sum() / jnp.maximum(present.sum(), 1)
