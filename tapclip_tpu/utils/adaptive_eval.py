"""Input-aware two-path evaluation (PIVOT-style, PAPERS.md).

The retrieved PIVOT paper selects a cheap or expensive compute path per
input based on input difficulty. TPU-shaped realization with two STATIC
executables (no per-sample control flow inside jit):

1. every batch runs the CHEAP path (token-pruned tower, optionally int8);
2. samples whose top-1/top-2 logit margin falls below ``margin`` are
   "hard": they are gathered host-side into fixed-size rescue batches
   (padded, masked — the expensive executable also compiles exactly once)
   and re-scored by the FULL tower;
3. hard samples take the full-path logits, easy ones keep the cheap ones.

Accuracy approaches the full tower's as ``margin`` grows (at margin -> inf
every sample is rescued and the result is exactly the full path); throughput
approaches the pruned tower's as the easy fraction grows.  The trade is
input-distribution-dependent — callers pick ``margin`` on a validation set.

Cites: PIVOT (arxiv 2404.15185) for the input-aware selection idea; the
cheap path is this repo's attention-aware token pruning (EViT/ATS-style).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np


@functools.lru_cache(maxsize=8)
def _logits_fn(clip_cfg, prompt_cfg):
    import jax

    from tapclip_tpu.models.model_wrapper import full_model_forward

    @jax.jit
    def run(clip_params, trainable, bank, images):
        out = full_model_forward(
            clip_params, trainable, bank, images, None,
            clip_cfg=clip_cfg, prompt_cfg=prompt_cfg, with_loss=False,
        )
        return out["logits"]

    return run


def _margins(logits: np.ndarray) -> np.ndarray:
    top2 = np.partition(logits, -2, axis=-1)[:, -2:]
    return top2[:, 1] - top2[:, 0]


def adaptive_logits(
    model,
    images,
    *,
    margin: float,
    cheap_cfg=None,
    rescue_batch: Optional[int] = None,
    mask=None,
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """Two-path logits for one batch. Returns (logits [B, C], stats).

    ``cheap_cfg`` defaults to the model's config with ``token_keep_ratio=0.5``
    (pass your own to add ``quantize_tower=True`` etc.). ``rescue_batch``
    defaults to the input batch size (one spare executable shape).
    ``mask`` (bool [B], optional) marks valid rows: padding rows are never
    treated as hard (their margins are arbitrary), so ``rescue_frac`` is a
    fraction of VALID samples and cannot exceed 1.
    """
    import jax.numpy as jnp

    full_cfg = model.clip_cfg
    if cheap_cfg is None:
        cheap_cfg = full_cfg.replace(token_keep_ratio=0.5)
    bank = model.prompt_learner.bank
    images = jnp.asarray(images)
    B = images.shape[0]
    rescue_batch = rescue_batch or B

    cheap = _logits_fn(cheap_cfg, model.prompt_cfg)
    # np.array (copy): np.asarray of a jax array is a read-only view and the
    # rescue pass writes into the hard rows below.
    logits = np.array(
        cheap(model.clip_params, model.trainable, bank, images), np.float32
    )

    is_hard = _margins(logits) < margin
    if mask is not None:
        is_hard &= np.asarray(mask, bool)
    hard = np.nonzero(is_hard)[0]
    n_hard = len(hard)
    if n_hard:
        run_full = _logits_fn(full_cfg, model.prompt_cfg)
        for start in range(0, n_hard, rescue_batch):
            idx = hard[start : start + rescue_batch]
            pad = rescue_batch - len(idx)
            # pad by repeating the first hard sample: static shape, results
            # for pad rows are discarded
            sel = np.concatenate([idx, np.full(pad, idx[0])]) if pad else idx
            out = np.asarray(
                run_full(model.clip_params, model.trainable, bank, images[sel]),
                np.float32,
            )
            logits[idx] = out[: len(idx)]
    n_valid = int(np.asarray(mask, bool).sum()) if mask is not None else B
    stats = {"n": n_valid, "n_rescued": int(n_hard),
             "rescue_frac": round(n_hard / max(n_valid, 1), 4)}
    return logits, stats


def evaluate_adaptive(model, dataloader, *, margin: float,
                      cheap_cfg=None) -> Tuple[float, Dict[str, Any]]:
    """Accuracy over a loader with the two-path scheme; returns
    (accuracy_pct, aggregate stats)."""
    correct = total = rescued = 0
    from tapclip_tpu.data.prefetch import background_iter

    for images, labels, mask in background_iter(dataloader):
        logits, st = adaptive_logits(model, images, margin=margin,
                                     cheap_cfg=cheap_cfg, mask=mask)
        preds = logits[:, : model.n_cls].argmax(-1)
        keep = np.asarray(mask)
        labels = np.asarray(labels)
        correct += int(((preds == labels) & keep).sum())
        total += int(keep.sum())
        rescued += st["n_rescued"]
    acc = 100.0 * correct / max(total, 1)
    return acc, {"total": total, "rescued": rescued,
                 "rescue_frac": round(rescued / max(total, 1), 4)}
