"""Training engine: epoch loop with early stopping + feature caching.

Rebuild of the reference's eager epoch loop (``/root/reference/train.py:90-128``)
and the few-shot fine-tune helper (``test_cross_domain2.py:17-29``):

* the frozen image tower runs **once** per dataset (features cached — the
  per-epoch cost is text-tower-only, numerically identical to recomputing);
* one jitted train step per batch, AdamW over the context bank only
  (``train.py:65-67``, ``test_cross_domain2.py:13-15``);
* greedy best-state tracking with patience (``train.py:121-128``).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import CLIPConfig, PromptConfig, TrainConfig
from tapclip_tpu.models.model_wrapper import FullModel, full_model_forward
from tapclip_tpu.parallel.train_step import (
    encode_dataset_features,
    init_train_state,
    make_eval_step,
    make_image_encoder,
    make_optimizer,
    make_train_step,
)
from tapclip_tpu.utils.logging_utils import StepTimer

log = logging.getLogger("tapclip_tpu")


def _multi_template_anchor(model: FullModel, templates, init_adjustor,
                           anchor_fn):
    """Template-ensembled zero-shot anchor in the tuned geometry.

    One frozen template-initialized ``PromptBank`` per template (same class
    list, same tokenizer), each encoded through ``anchor_fn`` (the
    same-pipeline attribution -> adjust -> encode path), then the
    L2-normalized per-template features are averaged and renormalized —
    PromptSRC's textual-diversity anchor (Khattak et al. 2023, the
    multi-prompt frozen text target of L_SCL).  Returns ``[C_max, E]``
    padded to the MODEL bank's width.
    """
    from tapclip_tpu.models.prompt_learner import PromptLearner

    if not model.prompt_cfg.use_init_prompt:
        # Template-ensembled anchors are only coherent under template init:
        # with use_init_prompt=False the context is a random draw, a fresh
        # per-template learner would draw a DIFFERENT random context than
        # the live model did, and the "model's own zero-shot features"
        # property the same-pipeline anchor exists for would be silently
        # violated.  The single-anchor path (the model's actual init bank)
        # remains available.
        raise ValueError(
            "anchor_templates requires PromptConfig.use_init_prompt=True — "
            "with a random context init the multi-template anchor would not "
            "be the model's own zero-shot features (drop anchor_templates "
            "to anchor on the model's actual init context instead)"
        )
    C_max = model.prompt_learner.bank.ctx.shape[0]
    acc = None
    for t in templates:
        pcfg_t = dataclasses.replace(model.prompt_cfg, template=t)
        learner_t = PromptLearner(
            list(model.class_names), model.clip_params, model.clip_cfg,
            pcfg_t, model.tokenizer, banner=False,
        )
        f = anchor_fn(model.clip_params, learner_t.bank.ctx, learner_t.bank,
                      init_adjustor)  # [cap_t, E], L2-normalized rows
        f = np.array(f, np.float32)[: len(model.class_names)]  # writable copy
        acc = f if acc is None else acc + f
    acc /= len(templates)
    norm = np.linalg.norm(acc, axis=-1, keepdims=True)
    acc = acc / np.maximum(norm, 1e-12)
    out = np.zeros((C_max, acc.shape[-1]), np.float32)
    out[: acc.shape[0]] = acc
    return jnp.asarray(out)


def _restore_opt_state(template, restored):
    """Rehydrate a checkpointed optimizer state into the optax structure.

    Orbax restores without a target lose NamedTuple types; leaf order is
    stable, so unflatten the restored leaves into the template's treedef.
    """
    if restored is None:
        return template
    leaves = jax.tree.leaves(restored)
    treedef = jax.tree.structure(template)
    tmpl_leaves = jax.tree.leaves(template)
    if len(leaves) != len(tmpl_leaves):
        raise ValueError(
            f"optimizer state mismatch: {len(leaves)} leaves vs {len(tmpl_leaves)}"
        )
    return jax.tree.unflatten(
        treedef,
        [jnp.asarray(l).astype(t.dtype) for l, t in zip(leaves, tmpl_leaves)],
    )


@dataclasses.dataclass
class CachedSet:
    feats: np.ndarray  # [N, E] unnormalized image-tower features
    labels: np.ndarray  # [N]


def cache_features(model: FullModel, loader, encoder=None) -> CachedSet:
    feats, labels = encode_dataset_features(
        model.clip_params, model.clip_cfg, loader, encoder=encoder
    )
    return CachedSet(feats=feats, labels=labels)


class PathFeatureCache:
    """Frozen-tower features keyed by image path.

    The cross-domain transfer grid (``test_cross_domain*.py``) evaluates each
    domain under several ``num_shots`` settings whose val splits overlap
    almost entirely; the reference re-decodes and re-encodes every image for
    every cell (SURVEY.md §3.5).  Keying features by path makes the whole
    grid cost ONE image-tower pass per distinct image.
    """

    def __init__(
        self,
        model: FullModel,
        *,
        batch_size: int = 128,
        preprocess=None,
        num_workers: int = 4,
    ):
        from tapclip_tpu.parallel.train_step import make_image_encoder

        self.model = model
        self.batch_size = batch_size
        self.preprocess = preprocess
        self.num_workers = num_workers
        self._encoder = make_image_encoder(model.clip_cfg)
        self._feats: Dict[str, np.ndarray] = {}

    def ensure(self, paths) -> None:
        from tapclip_tpu.data.imagefolder import Loader

        missing = [p for p in dict.fromkeys(paths) if p not in self._feats]
        if not missing:
            return
        loader = Loader(
            [(p, 0) for p in missing],
            self.batch_size,
            image_size=self.model.clip_cfg.image_size,
            preprocess=self.preprocess,
            num_workers=self.num_workers,
        )
        from tapclip_tpu.data.prefetch import prefetch_to_device

        it = iter(missing)
        for images, _, mask in prefetch_to_device(loader):
            f = np.asarray(self._encoder(self.model.clip_params, jnp.asarray(images)))
            for row, ok in zip(f, np.asarray(mask)):
                if ok:
                    self._feats[next(it)] = row

    def gather(self, samples) -> CachedSet:
        """``samples``: [(path, label)] -> CachedSet (encoding on demand)."""
        self.ensure([p for p, _ in samples])
        feats = np.stack([self._feats[p] for p, _ in samples])
        labels = np.asarray([lb for _, lb in samples], np.int32)
        return CachedSet(feats=feats, labels=labels)

    def __len__(self) -> int:
        return len(self._feats)


def _batches(cached: CachedSet, batch_size: int, *, shuffle: bool, seed: int):
    n = len(cached.labels)
    order = (
        np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    )
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        feats = cached.feats[idx]
        labels = cached.labels[idx]
        mask = np.ones(len(idx), bool)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            feats = np.concatenate([feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
            labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
            mask = np.concatenate([mask, np.zeros((pad,), bool)])
        yield jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask)


def evaluate_cached(
    model: FullModel, cached: CachedSet, batch_size: int = 256, mesh=None
) -> Tuple[float, Dict[int, float]]:
    """(overall %, per-class %) on cached features.

    With ``mesh``, each batch is sharded over the ``data`` axis before the
    jitted step — the "one batched, sharded inference pass" of the
    BASELINE.json north star.
    """
    eval_step = make_eval_step(model.clip_cfg, model.prompt_cfg)
    correct = total = 0
    C = model.prompt_learner.bank.capacity
    pcc = np.zeros(C, np.int64)
    pct = np.zeros(C, np.int64)
    for feats, labels, mask in _batches(cached, batch_size, shuffle=False, seed=0):
        if mesh is not None:
            from tapclip_tpu.parallel.sharding import shard_batch

            feats, labels, mask = shard_batch((feats, labels, mask), mesh)
        out = eval_step(
            model.clip_params, model.trainable, model.prompt_learner.bank, feats, labels, mask
        )
        correct += int(out["correct"])
        total += int(out["total"])
        pcc += np.asarray(out["per_class_correct"], np.int64)
        pct += np.asarray(out["per_class_total"], np.int64)
    acc = 100.0 * correct / total if total else 0.0
    per_class = {
        c: (100.0 * pcc[c] / pct[c] if pct[c] else 0.0) for c in range(C) if pct[c]
    }
    return acc, per_class


@dataclasses.dataclass
class FitResult:
    best_acc: float
    best_trainable: Dict[str, Any]
    acc_history: List[float]
    loss_history: List[float]
    per_class_history: Dict[str, List[float]]
    epochs_run: int
    steps_per_sec: float = float("nan")
    final_state: Any = None  # TrainState (params + optimizer state) for resume
    attr_entropy: List[float] = dataclasses.field(default_factory=list)
    # The CachedSet the fit evaluated against (None when no val set): callers
    # re-scoring alternative prompts (PromptSRC GPA, soup selection) reuse it
    # instead of paying a second full image-tower pass over the val loader.
    val_cache: Any = None


def fit_prompt_model(
    model: FullModel,
    train_loader,
    val_loader,
    train_cfg: TrainConfig,
    *,
    epochs: Optional[int] = None,
    eval_every: int = 1,
    track_best: bool = True,
    verbose: bool = True,
    resume_state=None,
    checkpoint_cb: Optional[Callable] = None,
    checkpoint_every: int = 0,
    trainable_keys: Optional[Tuple[str, ...]] = None,
) -> FitResult:
    """Reference train loop (train.py:90-128) over cached features.

    ``resume_state``: a restored ``{"trainable": ..., "opt_state": ...,
    "step": int}`` dict for exact mid-training resume (the reference never
    saves optimizer state, SURVEY.md §5 — we do).

    ``trainable_keys``: which leaves of ``model.trainable`` the optimizer
    sees.  Default ``None`` mirrors the reference exactly — prompt context
    only (train.py:65-67), plus the meta-net when image-conditioned.
    Protocols that transfer class-agnostic machinery (base-to-new) pass
    e.g. ``("ctx", "adjustor", "logit_scale")``.
    """
    epochs = epochs if epochs is not None else train_cfg.epochs
    if model.prompt_cfg.maple_depth > 0:
        raise NotImplementedError(
            "fit_prompt_model trains over CACHED image features; MaPLe's "
            "vision prompts make features trainable-dependent — use "
            "tapclip_tpu.maple.fit_maple"
        )
    # The optimized set mirrors the reference (prompt context only,
    # train.py:65-67); the CoCoOp-style meta-net joins it when enabled —
    # image conditioning is inert unless the meta-net trains.  Validated
    # before the (expensive) feature-caching pass so misuse fails fast.
    if trainable_keys is None:
        trainable_keys = ("ctx", "meta_net") if model.prompt_cfg.image_conditioned \
            else ("ctx",)
    else:
        trainable_keys = tuple(trainable_keys)
        missing = [k for k in trainable_keys if k not in model.trainable]
        if missing:
            raise ValueError(
                f"trainable_keys {missing} not in model.trainable "
                f"(have {sorted(model.trainable)})"
            )
    encoder = make_image_encoder(model.clip_cfg)
    # Loaders and pre-cached feature sets are both accepted.
    train_cache = (
        train_loader
        if isinstance(train_loader, CachedSet)
        else cache_features(model, train_loader, encoder)
    )
    val_cache = (
        val_loader
        if isinstance(val_loader, CachedSet)
        else (cache_features(model, val_loader, encoder) if val_loader else None)
    )

    optimizer = make_optimizer(train_cfg)
    # Capture the model's own zero-shot (init) adjustor BEFORE the resume
    # branch overwrites model.trainable: the KgCoOp anchor below must be the
    # frozen init-state features, not a restored mid-training adjustor —
    # otherwise a resumed fit anchors its kg penalty to a moving target and
    # diverges from the uninterrupted run.
    init_adjustor = model.trainable.get("adjustor")
    # Same pre-resume capture for the ProGrad zero-shot temperature: the
    # frozen zero-shot distribution must use the INIT logit scale even when
    # logit_scale joins trainable_keys (or a resume restores a trained one).
    init_logit_scale = float(model.trainable["logit_scale"])
    if resume_state is not None:
        from tapclip_tpu.parallel.train_step import TrainState

        base = init_train_state(model.trainable, optimizer, trainable_keys)
        state = TrainState(
            step=jnp.asarray(resume_state.get("step", 0), jnp.int32),
            params=jax.tree.map(jnp.asarray, dict(resume_state["trainable"])),
            opt_state=_restore_opt_state(base.opt_state, resume_state.get("opt_state")),
        )
        model.trainable = state.params
    else:
        state = init_train_state(model.trainable, optimizer, trainable_keys)
    kg_feats = None
    if (train_cfg.kg_lambda > 0.0 or train_cfg.prograd_lambda > 0.0
            or train_cfg.scl_lambda > 0.0):
        # KgCoOp / ProGrad anchor: the frozen zero-shot class
        # embeddings, built through the SAME pipeline the tuned features use
        # (template-initialized context -> attribution -> adjust -> encode
        # under prompt_cfg.text_mode).  Using build_zero_shot_classifier here
        # would put the anchor in a different embedding geometry whenever
        # text_mode='ref_compat' (no pos emb / ln_final, T-1 pooling), so the
        # penalty would pull toward a cross-mode target and be large even at
        # init.  With the same-pipeline anchor, loss_kg == 0 exactly at the
        # template init, matching the paper's construction.
        from tapclip_tpu.models.model_wrapper import (
            text_features_with_attribution,
        )

        # clip_params/bank are jit ARGUMENTS, not closure captures: closing
        # over the param tree bakes it into the program as literals (CLAUDE.md
        # — HTTP 413 from the remote compile service at ViT-B+ sizes).
        anchor_fn = jax.jit(
            lambda cp, ctx, bank, adj: text_features_with_attribution(
                cp, ctx, bank, model.clip_cfg, model.prompt_cfg, adj,
            )[0]
        )
        # bank.ctx is the frozen template initialization and init_adjustor
        # the pre-resume init state (the anchor must not track training),
        # so this is the model's own zero-shot features.  Already padded to
        # the bank width [C_max, E]; padding rows are class-masked out of
        # the penalty inside the step.
        if train_cfg.anchor_templates:
            # PromptSRC textual diversity: ensemble the anchor over multiple
            # templates, each encoded through the SAME tuned-geometry
            # pipeline (a fresh template-initialized PromptBank per
            # template), normalized-mean then renormalized — the standard
            # CLIP template-ensembling recipe applied inside the tuned
            # embedding geometry instead of via build_zero_shot_classifier.
            kg_feats = _multi_template_anchor(
                model, train_cfg.anchor_templates, init_adjustor, anchor_fn
            )
        else:
            kg_feats = anchor_fn(model.clip_params,
                                 model.prompt_learner.bank.ctx,
                                 model.prompt_learner.bank, init_adjustor)
    step_fn = make_train_step(model.clip_cfg, model.prompt_cfg, optimizer,
                              trainable_keys=trainable_keys,
                              kg_lambda=train_cfg.kg_lambda,
                              kg_feats=kg_feats,
                              prograd_lambda=train_cfg.prograd_lambda,
                              anchor_scale=init_logit_scale,
                              scl_lambda=train_cfg.scl_lambda)
    bank = model.prompt_learner.bank
    clip_params = model.clip_params

    best_acc = 0.0
    best_trainable = dict(model.trainable)
    patience_ctr = 0
    acc_hist: List[float] = []
    loss_hist: List[float] = []
    ent_hist: List[float] = []
    per_class_hist: Dict[str, List[float]] = {n: [] for n in model.class_names}
    timer = StepTimer(warmup=1)
    n_steps = 0

    # Per-epoch attribution entropy (the reference defines this metric but
    # never calls it, eval_metrics.py:76-81; we surface it).  Attribution is
    # class-level, so this is one tiny jitted text pass.
    from tapclip_tpu.models.attribution_monitor import attribution_entropy
    from tapclip_tpu.models.model_wrapper import text_features_with_attribution

    n_cls = model.n_cls

    @jax.jit
    def _attr_entropy(ctx, adjustor):
        _, attribution = text_features_with_attribution(
            clip_params, ctx, bank, model.clip_cfg, model.prompt_cfg, adjustor
        )
        return attribution_entropy(attribution[:n_cls])

    # tqdm epoch progress (reference: train.py:94,106); falls back silently.
    epoch_iter = range(1, epochs + 1)
    if verbose:
        try:
            from tqdm import tqdm

            epoch_iter = tqdm(epoch_iter, desc="epochs", ncols=100, leave=False)
        except ImportError:
            pass

    for epoch in epoch_iter:
        epoch_loss, n_batches = 0.0, 0
        for feats, labels, mask in _batches(
            train_cache, train_cfg.batch_size, shuffle=True, seed=train_cfg.seed + epoch
        ):
            timer.tic()
            state, metrics = step_fn(clip_params, state, bank, feats, labels, mask)
            epoch_loss += float(metrics["loss"])
            timer.toc(int(mask.sum()))
            n_batches += 1
            n_steps += 1
        avg_loss = epoch_loss / max(n_batches, 1)
        loss_hist.append(avg_loss)
        model.trainable = state.params
        ent_hist.append(
            float(_attr_entropy(state.params["ctx"], state.params["adjustor"]))
        )
        epoch_acc = None
        stop = False
        if val_cache is not None and epoch % eval_every == 0:
            acc, per_class = evaluate_cached(model, val_cache)
            epoch_acc = acc
            acc_hist.append(acc)
            for i, name in enumerate(model.class_names):
                per_class_hist[name].append(per_class.get(i, 0.0))
            if verbose:
                # Reference's per-epoch log lines, format-identical
                # (train.py:109-119); the attribution-entropy line is this
                # framework's extension (the reference computes it never).
                log.info("[Epoch %d] \U0001f3cb️ Avg Train Loss: %.4f",
                         epoch, avg_loss)
                log.info("[Epoch %d] \U0001f9ea Val Accuracy: %.2f%%",
                         epoch, acc)
                log.info(
                    "[Epoch %d] \U0001f4ca Per-Class Accuracy: %s",
                    epoch,
                    {n: per_class.get(i, 0.0)
                     for i, n in enumerate(model.class_names)},
                )
                log.info("[Epoch %d] attr entropy: %.4f", epoch, ent_hist[-1])
            if track_best:
                if acc > best_acc:
                    best_acc = acc
                    best_trainable = dict(model.trainable)
                    patience_ctr = 0
                else:
                    patience_ctr += 1
                    if patience_ctr == train_cfg.patience:
                        stop = True
        elif verbose:
            log.info("[Epoch %d] \U0001f3cb️ Avg Train Loss: %.4f",
                     epoch, avg_loss)

        if checkpoint_cb is not None and checkpoint_every > 0 and (
            epoch % checkpoint_every == 0 or stop
        ):
            # Periodic snapshot (params + optimizer state) for preemption-safe
            # resume — the reference only ever saves the final best state.
            # The epoch's val accuracy rides along when this epoch evaluated
            # (None otherwise) so retention policies can rank by metric.
            checkpoint_cb(epoch, state, epoch_acc)
        if stop:
            break

    if not track_best or val_cache is None:
        best_trainable = dict(model.trainable)
        best_acc = acc_hist[-1] if acc_hist else 0.0
    return FitResult(
        best_acc=best_acc,
        best_trainable=best_trainable,
        acc_history=acc_hist,
        loss_history=loss_hist,
        per_class_history=per_class_hist,
        epochs_run=len(loss_hist),
        steps_per_sec=1.0 / timer.mean_step_s if n_steps > 2 else float("nan"),
        final_state=state,
        attr_entropy=ent_hist,
        val_cache=val_cache,
    )


def fine_tune_on_few_shot(
    model: FullModel, loader, *, steps: int = 10, lr: float = 5e-3
) -> FitResult:
    """test_cross_domain2.py:17-29: N full passes over the few-shot loader,
    AdamW over context bank only; no early stopping, no best tracking."""
    cfg = TrainConfig(lr=lr, epochs=steps, patience=steps + 1)
    return fit_prompt_model(
        model, loader, None, cfg, epochs=steps, track_best=False, verbose=False
    )
