"""Jitted train / eval steps for prompt tuning.

Replaces the reference's eager epoch loop (``/root/reference/train.py:90-106``)
with a single jitted step: forward (fused class-level attribution), backward
into the context bank only, AdamW update.  The reference optimizes
``model.prompt_learner.parameters()`` exclusively (``train.py:65-67``) — i.e.
the per-class context vectors; the adjustor MLP and ``logit_scale`` stay
frozen (the adjustor isn't in ``prompt_learner`` and the drivers use the
parameter-free 'scale' method anyway).  ``trainable_keys`` widens that set
when wanted.

Data parallelism: the step is sharding-agnostic — feed batches placed with
``P("data")`` under a mesh context and XLA turns the loss mean into a
cross-chip reduction (psum over ICI); no pmap/no manual collectives.

The image tower is frozen, so both steps accept precomputed image features
(``feats``) instead of pixels — callers cache features once per dataset and
epochs become text-tower-only (numerically identical to recomputing).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tapclip_tpu.config import CLIPConfig, PromptConfig, TrainConfig
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models.model_wrapper import NEG_INF, full_model_forward
from tapclip_tpu.models.prompt_learner import PromptBank


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Dict[str, Any]  # full trainable dict (ctx, adjustor, logit_scale)
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.lru_cache(maxsize=32)
def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW, reference hyperparameters (train.py:65-67: lr=2e-3, wd=0.01)."""
    return optax.adamw(
        learning_rate=train_cfg.lr,
        weight_decay=train_cfg.weight_decay,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
    )


def init_train_state(
    trainable: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    trainable_keys: Tuple[str, ...] = ("ctx",),
) -> TrainState:
    diff = {k: trainable[k] for k in trainable_keys}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=dict(trainable),
        opt_state=optimizer.init(diff),
    )


def _prograd_project(g_d, g_g, lam: float):
    """ProGrad conflict projection (Zhu et al., ICCV 2023, eq. 4).

    ``g_d``: the task (CE) gradient pytree; ``g_g``: the general-knowledge
    gradient (of KL(zero-shot || tuned)).  When the flat-vector dot is
    negative, subtract ``lam`` times g_d's component along g_g — the update
    never increases the KL to the zero-shot predictions (at ``lam=1`` it is
    exactly orthogonal to g_g).  A relative norm guard skips the projection
    when g_g is float noise (|g_g|^2 < 1e-12 |g_d|^2 — e.g. at template
    init, where tuned == zero-shot and the KL gradient is identically 0):
    projecting against a noise direction would delete a random component
    of the task gradient.

    Returns ``(projected_grads, conflict)`` with ``conflict`` a 0/1 scalar.
    """
    from jax.flatten_util import ravel_pytree

    flat_d, unravel = ravel_pytree(g_d)
    flat_g, _ = ravel_pytree(g_g)
    dd = jnp.vdot(flat_d, flat_d)
    gg = jnp.vdot(flat_g, flat_g)
    dot = jnp.vdot(flat_d, flat_g)
    conflict = (dot < 0.0) & (gg > 1e-12 * dd)
    coef = jnp.where(conflict, dot / jnp.maximum(gg, 1e-30), 0.0)
    return unravel(flat_d - lam * coef * flat_g), conflict.astype(jnp.float32)


def make_train_step(
    clip_cfg: CLIPConfig,
    prompt_cfg: PromptConfig,
    optimizer: optax.GradientTransformation,
    trainable_keys: Tuple[str, ...] = ("ctx",),
    use_image_feats: bool = True,
    kg_lambda: float = 0.0,
    kg_feats=None,
    prograd_lambda: float = 0.0,
    anchor_scale: Optional[float] = None,
    scl_lambda: float = 0.0,
) -> Callable:
    """Returns jitted ``step(clip_params, state, bank, images_or_feats, labels, mask)``.

    ``kg_lambda``/``kg_feats``: the KgCoOp anchor (Yao et al. 2023) — adds
    ``kg_lambda * mean_c(1 - cos(text_feats_c, kg_feats_c))`` over the valid
    classes, pulling the learned class embeddings toward the frozen
    zero-shot classifier ``kg_feats [C_max, E]`` (L2-normalized, padded to
    the bank width).  Off by default: the reference's loss is CE-only.

    ``prograd_lambda``: ProGrad (Zhu et al. 2023) — per step, also compute
    the gradient of KL(zero-shot preds || tuned preds) against the same
    frozen ``kg_feats`` classifier, and when the two gradients conflict
    subtract ``prograd_lambda`` times the task gradient's component along
    it (see :func:`_prograd_project`).  Needs ``kg_feats``; composes with
    ``kg_lambda`` (the projection applies to the composed loss gradient).

    ``scl_lambda``: PromptSRC-style logit self-regularization (Khattak et
    al. 2023 L_SCL-logits) — the same KL(zero-shot || tuned) term added to
    the LOSS (soft distillation from the frozen zero-shot predictions)
    instead of used as a projection direction.  Needs ``kg_feats`` +
    ``anchor_scale``; composes with both lambdas above.

    The CE-only form is lru-cached (hashable args); the anchored forms
    close over their KB-sized anchor, so each distinct anchor builds a
    fresh step.
    """
    if kg_lambda > 0.0 or prograd_lambda > 0.0 or scl_lambda > 0.0:
        if kg_feats is None:
            raise ValueError(
                "kg_lambda/prograd_lambda/scl_lambda > 0 requires kg_feats "
                "(the zero-shot anchor)"
            )
        if (prograd_lambda > 0.0 or scl_lambda > 0.0) and not use_image_feats:
            raise ValueError(
                "prograd_lambda/scl_lambda require the cached-feature step "
                "(use_image_feats=True): the zero-shot logits are built "
                "from the feature batch"
            )
        if (prograd_lambda > 0.0 or scl_lambda > 0.0) and anchor_scale is None:
            raise ValueError(
                "prograd_lambda/scl_lambda > 0 requires anchor_scale (the "
                "INIT-time raw logit_scale): the zero-shot side must stay "
                "frozen even when logit_scale is in trainable_keys"
            )
        return _make_train_step_impl(
            clip_cfg, prompt_cfg, optimizer, trainable_keys, use_image_feats,
            kg_lambda, jnp.asarray(kg_feats, jnp.float32), prograd_lambda,
            anchor_scale, scl_lambda,
        )
    return _make_train_step_cached(
        clip_cfg, prompt_cfg, optimizer, trainable_keys, use_image_feats
    )


@functools.lru_cache(maxsize=32)
def _make_train_step_cached(clip_cfg, prompt_cfg, optimizer, trainable_keys,
                            use_image_feats):
    return _make_train_step_impl(clip_cfg, prompt_cfg, optimizer,
                                 trainable_keys, use_image_feats, 0.0, None,
                                 0.0, None, 0.0)


def _make_train_step_impl(
    clip_cfg: CLIPConfig,
    prompt_cfg: PromptConfig,
    optimizer: optax.GradientTransformation,
    trainable_keys: Tuple[str, ...],
    use_image_feats: bool,
    kg_lambda: float,
    kg_feats,
    prograd_lambda: float,
    anchor_scale,
    scl_lambda: float,
) -> Callable:
    use_kg = kg_lambda > 0.0
    use_prograd = prograd_lambda > 0.0
    use_scl = scl_lambda > 0.0

    def loss_fn(diff_params, rest_params, clip_params, bank, x, labels, mask):
        trainable = {**rest_params, **diff_params}
        out = full_model_forward(
            clip_params,
            trainable,
            bank,
            None if use_image_feats else x,
            labels,
            clip_cfg=clip_cfg,
            prompt_cfg=prompt_cfg,
            with_loss=True,
            image_feats=x if use_image_feats else None,
            batch_mask=mask,
            return_text_feats=use_kg,
        )
        if use_kg:
            tf = out["text_feats"].astype(jnp.float32)  # [C,E] or [B,C,E]
            cos = (tf * kg_feats).sum(-1)  # [..., C]
            cm = bank.class_mask.astype(jnp.float32)
            kg = ((1.0 - cos) * cm).sum(-1) / jnp.maximum(cm.sum(), 1.0)
            out["loss_kg"] = kg.mean()  # mean over B in the conditioned case
            out["loss"] = out["loss"] + kg_lambda * out["loss_kg"]
        if use_scl:
            # PromptSRC L_SCL-logits: distill the frozen zero-shot
            # predictions into the tuned logits (kl_term resolves at call
            # time; same frozen anchor + init-scale as the prograd path).
            out["loss_scl"] = kl_term(out["logits"], bank, x, mask)
            out["loss"] = out["loss"] + scl_lambda * out["loss_scl"]
        return out["loss"], out

    def kl_term(logits, bank, x, mask):
        """KL(zero-shot preds || tuned preds), the ProGrad 'general
        knowledge' objective, from the tuned logits loss_fn already
        computed (no second forward).  The zero-shot side is the frozen
        kg_feats classifier over the SAME feature batch at the INIT-time
        logit scale (``anchor_scale``, a trace-time constant — using the
        live scale would let the 'frozen' zero-shot distribution sharpen
        whenever logit_scale is in trainable_keys, the same moving-anchor
        bug the trainer guards against for the adjustor)."""
        img = clip_model.l2_normalize(x).astype(jnp.float32)
        zs = jnp.exp(jnp.float32(anchor_scale)) * img @ kg_feats.T  # [B, C]
        # Padded-class mask uses the SAME finite sentinel as the tuned
        # logits (model_wrapper.NEG_INF = -1e9): with finfo.min the term
        # only cancels because exp(min - max) underflows to exactly 0 in
        # f32 — fragile under dtype changes.  With a shared finite sentinel
        # both distributions assign the pad classes identical (vanishing)
        # mass and the product is robustly bounded.
        zs = jnp.where(bank.class_mask[None, :], zs, jnp.float32(NEG_INF))
        p_zs = jax.nn.softmax(zs, axis=-1)
        kl = (p_zs * (jax.nn.log_softmax(zs, axis=-1)
                      - jax.nn.log_softmax(logits, axis=-1))).sum(-1)
        if mask is not None:
            m = mask.astype(jnp.float32)
            return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)
        return kl.mean()

    # NOTE: no buffer donation — trainable state is KB-sized and callers
    # commonly alias state.params["ctx"] with the PromptLearner bank's ctx
    # buffer; donating would invalidate the learner's copy.
    @jax.jit
    def step(clip_params, state: TrainState, bank: PromptBank, x, labels, mask):
        diff = {k: state.params[k] for k in trainable_keys}
        rest = {k: v for k, v in state.params.items() if k not in trainable_keys}
        if use_prograd:
            # ONE forward, two pullbacks: the KL needs only the tuned
            # logits, which loss_fn's forward already produces — jax.vjp
            # guarantees the shared residual computation is not duplicated
            # (two value_and_grad calls would rely on XLA CSE merging two
            # whole text-tower subgraphs).
            def pair_fn(d):
                loss, out = loss_fn(d, rest, clip_params, bank, x, labels,
                                    mask)
                return jnp.stack(
                    [loss.astype(jnp.float32),
                     kl_term(out["logits"], bank, x, mask)]
                ), out

            vals, pullback, out = jax.vjp(pair_fn, diff, has_aux=True)
            grads = pullback(jnp.asarray([1.0, 0.0], vals.dtype))[0]
            g_kl = pullback(jnp.asarray([0.0, 1.0], vals.dtype))[0]
            loss = vals[0]
            grads, conflict = _prograd_project(grads, g_kl, prograd_lambda)
            metrics = {"loss": loss, "loss_prograd_kl": vals[1],
                       "prograd_conflict": conflict}
        else:
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                diff, rest, clip_params, bank, x, labels, mask
            )
            metrics = {"loss": loss}
        updates, new_opt = optimizer.update(grads, state.opt_state, diff)
        new_diff = optax.apply_updates(diff, updates)
        new_state = TrainState(
            step=state.step + 1,
            params={**state.params, **new_diff},
            opt_state=new_opt,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        if "loss_kg" in out:
            metrics["loss_kg"] = out["loss_kg"]
        if "loss_scl" in out:
            metrics["loss_scl"] = out["loss_scl"]
        return new_state, metrics

    return step


@functools.lru_cache(maxsize=32)
def make_eval_step(
    clip_cfg: CLIPConfig,
    prompt_cfg: PromptConfig,
    use_image_feats: bool = True,
) -> Callable:
    """Returns jitted ``eval_step(clip_params, trainable, bank, x, labels, mask)``
    -> dict with per-batch correct/total and per-class counts (padded C_max)."""

    @jax.jit
    def step(clip_params, trainable, bank: PromptBank, x, labels, mask):
        out = full_model_forward(
            clip_params,
            trainable,
            bank,
            None if use_image_feats else x,
            None,
            clip_cfg=clip_cfg,
            prompt_cfg=prompt_cfg,
            with_loss=False,
            image_feats=x if use_image_feats else None,
        )
        logits = out["logits"]
        preds = jnp.argmax(logits, axis=-1)
        valid = mask.astype(jnp.int32)
        correct = ((preds == labels).astype(jnp.int32) * valid)
        C = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, C, dtype=jnp.int32) * valid[:, None]
        per_class_total = onehot.sum(axis=0)
        per_class_correct = (onehot * correct[:, None]).sum(axis=0)
        return {
            "correct": correct.sum(),
            "total": valid.sum(),
            "per_class_correct": per_class_correct,
            "per_class_total": per_class_total,
            "preds": preds,
        }

    return step


@functools.lru_cache(maxsize=8)
def make_image_encoder(clip_cfg: CLIPConfig) -> Callable:
    """Jitted frozen image-tower encoder (for feature caching)."""

    @jax.jit
    def encode(clip_params, images):
        return clip_model.encode_image(clip_params, clip_cfg, images)

    return encode


def encode_dataset_features(
    clip_params,
    clip_cfg: CLIPConfig,
    loader,
    *,
    encoder: Optional[Callable] = None,
):
    """Run the frozen image tower over a loader once; returns (feats, labels).

    The image tower never changes during prompt tuning, so caching features
    turns every later epoch into text-tower-only work — numerically identical
    to the reference recomputing the ViT each step (SURVEY.md §3.2 cost note).
    """
    import numpy as np

    from tapclip_tpu.data.prefetch import prefetch_to_device

    encoder = encoder or make_image_encoder(clip_cfg)
    feats, labels = [], []
    # Decode-ahead + async H2D: the next batch transfers while this one
    # runs the tower (data/prefetch.py).
    for images, lbls, mask in prefetch_to_device(loader):
        f = np.asarray(encoder(clip_params, jnp.asarray(images)))
        keep = np.asarray(mask)
        feats.append(f[keep])
        labels.append(np.asarray(lbls)[keep])
    return np.concatenate(feats), np.concatenate(labels)
