"""Evaluation metrics — API-parity port of ``/root/reference/utils/eval_metrics.py``.

``evaluate_accuracy`` / ``evaluate_per_class_accuracy`` keep the reference's
signatures and console output shape (``eval_metrics.py:7-73``), but run the
fused batched forward (no per-sample loops) and accumulate counts on device.

``attribution_entropy`` / ``attribution_variance`` (defined-but-uncalled in
the reference, ``eval_metrics.py:76-96``) are provided via the
attribution_monitor module and re-exported here.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

from tapclip_tpu.models.attribution_monitor import (  # noqa: F401
    attribution_entropy,
    attribution_variance,
)


def _accumulate(model, dataloader):
    correct = 0
    total = 0
    per_class_correct = defaultdict(int)
    per_class_total = defaultdict(int)
    from tapclip_tpu.data.prefetch import background_iter

    for images, labels, mask in background_iter(dataloader):
        out = model(images)
        logits = np.asarray(out["logits"])
        preds = logits.argmax(axis=1)
        keep = np.asarray(mask)
        labels = np.asarray(labels)
        correct += int(((preds == labels) & keep).sum())
        total += int(keep.sum())
        for t, p in zip(labels[keep], preds[keep]):
            per_class_total[int(t)] += 1
            if t == p:
                per_class_correct[int(t)] += 1
    return correct, total, per_class_correct, per_class_total


def evaluate_accuracy(model, dataloader, device=None, verbose: bool = True) -> float:
    """Overall accuracy (%) with per-class printout (eval_metrics.py:7-41).

    ``device`` is accepted for signature parity and ignored (JAX manages
    placement).
    """
    correct, total, pcc, pct = _accumulate(model, dataloader)
    acc = 100.0 * correct / total if total > 0 else 0.0
    if verbose:
        # Byte-identical to the reference's stdout (eval_metrics.py:31-38),
        # emoji prefixes included.
        print(f"\U0001f3af Overall Accuracy: {acc:.2f}%")
        print("\U0001f4ca Per-Class Accuracy:")
        for cls in sorted(pct.keys()):
            t, c = pct[cls], pcc[cls]
            a = 100.0 * c / t if t > 0 else 0.0
            print(f" - Class {cls:2d}: {a:.2f}% ({c}/{t})")
    return acc


def evaluate_per_class_accuracy(
    model, dataloader, device=None, class_names: Optional[Sequence[str]] = None
) -> Dict[str, float]:
    """Per-class accuracy dict keyed by class name (eval_metrics.py:45-73)."""
    _, _, pcc, pct = _accumulate(model, dataloader)
    acc_dict = {}
    for cls in sorted(pct.keys()):
        t, c = pct[cls], pcc[cls]
        a = 100.0 * c / t if t > 0 else 0.0
        name = class_names[cls] if class_names else str(cls)
        acc_dict[name] = a
    return acc_dict


def confusion_from_logits(
    logits: np.ndarray,
    labels: np.ndarray,
    mask: Optional[np.ndarray] = None,
    n_cls: Optional[int] = None,
) -> np.ndarray:
    """``[C, C]`` counts from collected logits (rows = true label)."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    keep = (
        np.ones(len(labels), bool) if mask is None else np.asarray(mask, bool)
    )
    C = int(n_cls if n_cls is not None else logits.shape[-1])
    cm = np.zeros((C, C), np.int64)
    np.add.at(cm, (labels[keep], logits.argmax(axis=-1)[keep]), 1)
    return cm


def confusion_matrix(model, dataloader, n_cls: Optional[int] = None) -> np.ndarray:
    """``[C, C]`` counts, rows = true label, cols = prediction.

    Beyond-reference observability: the reference prints per-class accuracy
    (the diagonal, ``eval_metrics.py:31-39``) but never shows WHICH classes
    absorb the errors — the readout cross-domain failure analysis actually
    needs.  Same loader contract as :func:`evaluate_accuracy` (masked padded
    batches).
    """
    from tapclip_tpu.data.prefetch import background_iter

    C = int(n_cls if n_cls is not None else model.n_cls)
    cm = np.zeros((C, C), np.int64)
    for images, labels, mask in background_iter(dataloader):
        logits = np.asarray(model(images)["logits"])
        cm += confusion_from_logits(logits, labels, mask, C)
    return cm


def retrieval_recall(
    img_feats: np.ndarray,
    txt_feats: np.ndarray,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """Bidirectional image<->text retrieval Recall@K over PAIRED features.

    Beyond-reference: the standard open_clip pretraining validation metric
    (the reference has no pretraining at all — its contrastive loss is an
    unimplemented sketch, ``/root/reference/models/model_wrapper.py:94-99``).
    Row ``i`` of ``img_feats`` pairs with row ``i`` of ``txt_feats``; a query
    scores a hit at K when its true partner ranks in the top-K columns of the
    cosine-similarity row.  Ties are counted pessimistically (a tie with the
    true pair's score displaces it), so identical features don't report
    R@1 == 1 spuriously.

    Returns ``{"i2t_r@K": ..., "t2i_r@K": ...}`` fractions in [0, 1].
    """
    img = np.asarray(img_feats, np.float32)
    txt = np.asarray(txt_feats, np.float32)
    if img.shape[0] != txt.shape[0]:
        raise ValueError(f"unpaired features: {img.shape[0]} vs {txt.shape[0]}")
    img = img / np.maximum(np.linalg.norm(img, axis=-1, keepdims=True), 1e-8)
    txt = txt / np.maximum(np.linalg.norm(txt, axis=-1, keepdims=True), 1e-8)
    sims = img @ txt.T  # [N, N]
    n = sims.shape[0]
    diag = np.diag(sims)
    # rank of the true pair within its row/column (0 = best); ties count
    # against the true pair (strictly-greater OR equal-but-not-self)
    i2t_rank = (sims >= diag[:, None]).sum(axis=1) - 1
    t2i_rank = (sims >= diag[None, :]).sum(axis=0) - 1
    out: Dict[str, float] = {}
    for k in ks:
        kk = min(k, n)
        out[f"i2t_r@{k}"] = float((i2t_rank < kk).mean())
        out[f"t2i_r@{k}"] = float((t2i_rank < kk).mean())
    return out
