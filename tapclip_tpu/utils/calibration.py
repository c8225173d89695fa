"""Probability calibration for served classifiers (temperature scaling).

Beyond-reference production readout: the reference exposes raw
``exp(logit_scale)``-scaled cosine logits (``/root/reference/models/
model_wrapper.py:79-83``) whose softmax is usually over-confident after
few-shot tuning.  Temperature scaling (Guo et al., 2017) is the standard
post-hoc fix: fit ONE scalar ``T`` minimizing validation NLL of
``softmax(logits / T)`` — it changes confidences, never argmax rankings.

TPU-shaped fit: the whole optimization is a single jitted ``fori_loop`` of
Newton steps on the scalar (one dispatch, no per-step host RTTs — the same
tunnel discipline as ``linear_probe``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def fit_temperature(
    logits: np.ndarray,
    labels: np.ndarray,
    mask: Optional[np.ndarray] = None,
    *,
    steps: int = 50,
) -> float:
    """Fit T > 0 minimizing NLL of ``softmax(logits / T)``; returns T.

    Newton's method on ``t = log T`` (the NLL is smooth and convex enough
    in ``t`` for classifier logits; 50 steps is far past convergence).
    """
    import jax
    import jax.numpy as jnp

    logits = jnp.asarray(logits, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    m = (
        jnp.ones(logits.shape[0], jnp.float32)
        if mask is None
        else jnp.asarray(mask, jnp.float32)
    )

    def nll(t):
        z = logits * jnp.exp(-t)
        lse = jax.nn.logsumexp(z, axis=-1)
        ll = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0]
        return ((lse - ll) * m).sum() / jnp.maximum(m.sum(), 1.0)

    g = jax.grad(nll)
    h = jax.grad(lambda t: g(t))

    @jax.jit
    def fit():
        def step(_, t):
            hess = h(t)
            # Newton when locally convex, gradient step otherwise.
            delta = jnp.where(hess > 1e-6, g(t) / jnp.maximum(hess, 1e-6),
                              g(t))
            return t - jnp.clip(delta, -1.0, 1.0)

        return jax.lax.fori_loop(0, steps, step, jnp.float32(0.0))

    return float(np.exp(np.asarray(fit())))


def expected_calibration_error(
    probs: np.ndarray,
    labels: np.ndarray,
    mask: Optional[np.ndarray] = None,
    n_bins: int = 15,
) -> float:
    """ECE: mean |confidence - accuracy| over equal-width confidence bins,
    weighted by bin occupancy (the standard 15-bin protocol)."""
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels)
    keep = np.ones(len(labels), bool) if mask is None else np.asarray(mask, bool)
    conf = probs.max(axis=-1)[keep]
    correct = (probs.argmax(axis=-1) == labels)[keep]
    if conf.size == 0:
        return 0.0
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (conf > lo) & (conf <= hi) if lo > 0 else (conf >= lo) & (conf <= hi)
        if sel.any():
            ece += sel.mean() * abs(conf[sel].mean() - correct[sel].mean())
    return float(ece)


def collect_logits(model, dataloader) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the model over a masked loader -> (logits, labels, mask) stacks
    (the inputs :func:`fit_temperature` wants)."""
    from tapclip_tpu.data.prefetch import background_iter

    ls, ys, ms = [], [], []
    for images, labels, mask in background_iter(dataloader):
        ls.append(np.asarray(model(images)["logits"]))
        ys.append(np.asarray(labels))
        ms.append(np.asarray(mask))
    return np.concatenate(ls), np.concatenate(ys), np.concatenate(ms)


def calibrate_from_logits(logits, labels, mask=None) -> dict:
    """Fit T on already-collected logits; returns
    ``{"temperature", "ece_before", "ece_after", "n"}``.  Use this when a
    val pass already produced logits (e.g. alongside a confusion matrix) —
    every extra pass re-decodes and re-encodes the whole val set."""
    T = fit_temperature(logits, labels, mask)

    def softmax(z):
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    n = len(labels) if mask is None else int(np.asarray(mask).sum())
    return {
        "temperature": T,
        "ece_before": expected_calibration_error(softmax(logits), labels, mask),
        "ece_after": expected_calibration_error(
            softmax(logits / T), labels, mask
        ),
        "n": n,
    }


def calibrate(model, dataloader) -> dict:
    """Fit T on a validation loader (one forward pass);
    see :func:`calibrate_from_logits`."""
    return calibrate_from_logits(*collect_logits(model, dataloader))
