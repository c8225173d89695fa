"""PromptSRC-style self-regulated prompt tuning (Khattak et al., ICCV 2023).

Composes the three self-regularization mechanisms over this framework's
existing anchored train step (reference has no analogue; the closest is the
plain CE loop at ``/root/reference/train.py:90-128``):

1. **Feature-level mutual agreement** — ``TrainConfig.kg_lambda``: cosine
   pull of the tuned class embeddings toward the frozen zero-shot
   classifier (the KgCoOp term; PromptSRC's L_SCL-feature analog over the
   text side — image features are frozen here, so the image branch of the
   paper's term is identically satisfied).
2. **Logit-level mutual agreement** — ``TrainConfig.scl_lambda``: soft
   distillation ``KL(zero-shot preds || tuned preds)`` at the frozen
   INIT-time temperature (L_SCL-logits).
3. **Gaussian prompt aggregation (GPA)** — the returned trainable is a
   Gaussian-weighted average of the per-epoch snapshots (weights
   ``N(epoch; mu, sigma)``), smoothing over the optimization trajectory
   instead of trusting one early-stopped point.  EVERY trained leaf is
   aggregated — the context bank always, plus the CoCoOp meta-net when
   ``PromptConfig.image_conditioned`` (and any extra ``trainable_keys``
   the caller optimizes), so the returned trainable is a coherent
   same-trajectory average, never a mixed (GPA ctx, best-epoch meta-net)
   pair.
4. **Textual diversity** — ``TrainConfig.anchor_templates``: with N
   templates, the frozen anchor behind (1)/(2) becomes the renormalized
   multi-template mean of same-pipeline class embeddings (the paper's
   multi-prompt frozen text target), built in the tuned features'
   embedding geometry by ``trainer._multi_template_anchor``.

All epochs run through the standard jitted anchored step; GPA rides the
trainer's ``checkpoint_cb`` hook, so this module adds no training-loop
code of its own.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional

import jax
import numpy as np

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.trainer import FitResult, evaluate_cached, fit_prompt_model

log = logging.getLogger("tapclip_tpu")


@dataclasses.dataclass
class PromptSRCResult:
    fit: FitResult
    gpa_trainable: Dict[str, Any]  # best_trainable with the GPA context
    gpa_acc: float  # val accuracy of the aggregated prompt
    best_is_gpa: bool  # did aggregation beat the early-stopped best?


def gaussian_weights(n: int, *, mu: Optional[float] = None,
                     sigma: Optional[float] = None) -> np.ndarray:
    """Normalized N(epoch; mu, sigma) weights over epochs 1..n.

    Paper defaults: mass centered past the middle of training (late prompts
    are better on-task, early ones more general — the Gaussian trades off
    both); ``mu = 0.6 n``, ``sigma = n/3`` unless given.
    """
    e = np.arange(1, n + 1, dtype=np.float64)
    mu = 0.6 * n if mu is None else mu
    sigma = max(n / 3.0, 1e-6) if sigma is None else max(sigma, 1e-6)
    w = np.exp(-0.5 * ((e - mu) / sigma) ** 2)
    return w / w.sum()


def fit_promptsrc(
    model,
    train_loader,
    val_loader,
    train_cfg: TrainConfig,
    *,
    gpa_mu: Optional[float] = None,
    gpa_sigma: Optional[float] = None,
    verbose: bool = True,
    **fit_kwargs,
) -> PromptSRCResult:
    """Run the PromptSRC recipe; returns the GPA-aggregated prompt.

    ``train_cfg`` supplies the two regularizer weights (``kg_lambda``,
    ``scl_lambda``) — pass the paper-style defaults explicitly, e.g.
    ``TrainConfig(kg_lambda=1.0, scl_lambda=1.0)``; this function only adds
    the trajectory aggregation.  The trainer's early-stopped best and the
    aggregated prompt are BOTH evaluated; ``model.trainable`` is left at
    whichever wins (``best_is_gpa`` says which).
    """
    if "checkpoint_cb" in fit_kwargs or "checkpoint_every" in fit_kwargs:
        raise ValueError(
            "fit_promptsrc drives checkpoint_cb itself (GPA snapshots); "
            "wrap fit_prompt_model directly for custom snapshotting"
        )
    if val_loader is None:
        raise ValueError(
            "fit_promptsrc needs a validation set: the GPA-vs-best winner "
            "is selected on validation accuracy (use fit_prompt_model "
            "directly for unvalidated training)"
        )
    # Aggregate exactly the leaves the fit optimizes (mirrors
    # fit_prompt_model's trainable_keys default): always ctx, plus the
    # CoCoOp meta-net when image-conditioned — a GPA ctx paired with a
    # best-epoch meta-net would be two different trajectory points.
    keys = fit_kwargs.get("trainable_keys")
    if keys is None:
        keys = (("ctx", "meta_net")
                if model.prompt_cfg.image_conditioned else ("ctx",))
    keys = tuple(keys)
    snaps = []

    def _collect(epoch, state, _acc):
        snaps.append(jax.tree.map(
            lambda x: np.asarray(x, np.float32),
            {k: state.params[k] for k in keys},
        ))

    fit = fit_prompt_model(
        model, train_loader, val_loader, train_cfg,
        checkpoint_cb=_collect, checkpoint_every=1, verbose=verbose,
        **fit_kwargs,
    )
    if not snaps:  # zero epochs — degenerate; nothing to aggregate
        return PromptSRCResult(fit, dict(fit.best_trainable),
                               fit.best_acc, False)

    w = gaussian_weights(len(snaps), mu=gpa_mu, sigma=gpa_sigma)
    gpa_diff = jax.tree.map(
        lambda *leaves: np.tensordot(w, np.stack(leaves), axes=1), *snaps
    )
    gpa_trainable = dict(fit.best_trainable)
    for k in keys:
        gpa_trainable[k] = jax.tree.map(
            lambda agg, ref: agg.astype(np.asarray(ref).dtype),
            gpa_diff[k], fit.best_trainable[k],
        )

    # Evaluate the aggregated prompt on the EXACT val features the fit used
    # (FitResult.val_cache — always set, since val_loader is required above);
    # re-caching from the loader would be a second full image-tower pass.
    val_cache = fit.val_cache
    model.trainable = gpa_trainable
    try:
        gpa_acc, _ = evaluate_cached(model, val_cache)
    except BaseException:
        # Leave the model in its pre-call (fit-best) state rather than
        # mutated to the numpy-ctx GPA candidate.
        model.trainable = dict(fit.best_trainable)
        raise
    best_is_gpa = gpa_acc >= fit.best_acc
    if not best_is_gpa:
        model.trainable = dict(fit.best_trainable)
    if verbose:
        log.info("PromptSRC GPA over %d epochs: %.2f%% vs best %.2f%% -> %s",
                 len(snaps), gpa_acc, fit.best_acc,
                 "GPA" if best_is_gpa else "early-stopped best")
    return PromptSRCResult(fit, gpa_trainable, gpa_acc, best_is_gpa)
