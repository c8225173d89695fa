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
