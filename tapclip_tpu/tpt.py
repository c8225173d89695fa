"""TPT: test-time prompt tuning (per-sample entropy minimization).

TPT (Shu et al., NeurIPS 2022) adapts the prompt context to EACH test image
at inference time: N augmented views are scored, the most-confident subset
is kept, and the context is updated for a few gradient steps to minimize the
entropy of the averaged prediction — then the clean view is classified with
the tuned context.  No labels, no training split: this is the test-time
axis of the adaptation-method zoo (docs/METHODS.md), missing from the
reference (its prompts are only ever trained offline,
``/root/reference/train.py``).

TPU-native shape: the image tower is frozen and prompt-independent, so ALL
view features are computed ONCE per batch ([B*V] through the fused tower);
the inner optimization loop re-runs only the TEXT tower, batched per
(sample, class) with a per-sample context ``[B, C, P, D]`` — the same tiled
machinery as the CoCoOp path (``model_wrapper._tile_bank``).  The whole
procedure (augment -> features -> K-step Adam -> classify) is ONE jitted
program per batch shape; per-sample optimizer state is just elementwise
Adam moments on the context tensor, so samples never interact.

Semantics note: the attribution pass inside the inner loop is
stop-gradient'ed exactly like training (the reference detaches it,
``/root/reference/models/clip_wrapper.py:36``), so TPT tunes the context
under the same gradient geometry ``fit_prompt_model`` uses.

Usage:
    python -m tapclip_tpu.tpt --val-root .../Real_World --model ViT-B-16 \\
        --pretrained ckpt/ --views 16 --steps 1
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")


@dataclasses.dataclass(frozen=True)
class TPTConfig:
    """Test-time tuning hyperparameters (paper defaults, scaled-down views).

    ``n_views`` counts the CLEAN view: view 0 is always the unaugmented
    image (the one that is finally classified), views ``1..n_views-1`` are
    random-resized-crop (+ optional flip) augmentations.  ``select_frac``
    keeps the most-confident ceil-fraction of views for the marginal-entropy
    loss (the paper's confidence selection, rho=0.1 at 64 views).
    """

    n_views: int = 16
    select_frac: float = 0.25
    steps: int = 1
    lr: float = 5e-3
    aug_scale_min: float = 0.3
    hflip: float = 0.5

    @property
    def n_selected(self) -> int:
        return max(1, min(self.n_views, round(self.select_frac * self.n_views)))


def _selected_marginal_entropy(logp, k: int):
    """Confidence-selected marginal entropy: ``[B, V, C]`` log-probs -> [B].

    Per sample: keep the ``k`` lowest-entropy views, average their
    probabilities, return the entropy of that marginal (TPT's objective).
    """
    import jax
    import jax.numpy as jnp

    ent = -(jnp.exp(logp) * logp).sum(-1)  # [B, V]
    _, idx = jax.lax.top_k(-ent, k)  # most confident k
    sel = jnp.take_along_axis(logp, idx[:, :, None], axis=1)  # [B, k, C]
    avg_p = jnp.exp(sel).mean(axis=1)  # [B, C]
    avg_logp = jnp.log(jnp.clip(avg_p, 1e-20, 1.0))
    return -(avg_p * avg_logp).sum(-1)


def make_tpt_predict_fn(clip_cfg, prompt_cfg, tpt: TPTConfig = TPTConfig()):
    """Build the jitted per-batch TPT program.

    Returns ``fn(clip_params, trainable, bank, images, rng, batch_mask) ->
    (logits [B, C], aux)`` where ``images`` is a preprocessed float batch
    (augmentation commutes with CLIP normalization — ``data/augment.py``),
    ``logits`` scores the CLEAN view under the per-sample tuned context, and
    ``aux = {"entropy_before", "entropy_after", "baseline_logits"}`` carries
    mask-weighted batch means of the selected-marginal entropy at the
    initial / final context plus the clean-view logits at the INITIAL
    context (samples never interact, so padding rows cannot perturb real
    rows — the mask only keeps them out of the telemetry).

    ``baseline_logits`` rides along from the first tuning step's forward
    (``value_and_grad`` aux) at zero extra cost, so callers that want the
    untuned baseline (``evaluate_tpt``) need no second jitted program — a
    ``steps=0`` twin would double compile time (remote compiles can exceed
    10 min here) and re-run the frozen image tower over all ``B*V`` views.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tapclip_tpu.data.augment import AugmentConfig, augment_batch
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import (
        NEG_INF,
        _tile_bank,
        text_features_with_attribution,
    )

    if prompt_cfg.image_conditioned:
        raise NotImplementedError(
            "TPT already tunes a per-sample context; image_conditioned "
            "(CoCoOp) does not compose with it"
        )
    if prompt_cfg.maple_depth > 0:
        raise NotImplementedError(
            "maple_depth makes the vision tower prompt-dependent, which "
            "would force a full image-tower pass per TPT step; use the "
            "text-only context (maple_depth=0) for test-time tuning"
        )

    V, K, steps = tpt.n_views, tpt.n_selected, tpt.steps
    aug_cfg = AugmentConfig(
        scale=(tpt.aug_scale_min, 1.0), ratio=(3 / 4, 4 / 3), hflip=tpt.hflip
    )
    opt = optax.adam(tpt.lr)

    @jax.jit
    def predict(clip_params, trainable, bank, images, rng, batch_mask=None):
        B, H, W, Ch = images.shape
        bm = (
            jnp.ones((B,), jnp.float32)
            if batch_mask is None
            else batch_mask.astype(jnp.float32)
        )
        bm_sum = jnp.maximum(bm.sum(), 1.0)
        if V > 1:
            rep = jnp.broadcast_to(
                images[:, None], (B, V - 1, H, W, Ch)
            ).reshape(B * (V - 1), H, W, Ch)
            aug = augment_batch(rng, rep, aug_cfg).reshape(B, V - 1, H, W, Ch)
            views = jnp.concatenate([images[:, None], aug], axis=1)
        else:
            views = images[:, None]

        # Frozen tower: every view featurized once, outside the tuning loop.
        vf = clip_model.l2_normalize(
            clip_model.encode_image(
                clip_params, clip_cfg, views.reshape(B * V, H, W, Ch)
            )
        ).reshape(B, V, -1).astype(jnp.float32)

        scale = jnp.exp(trainable["logit_scale"]).astype(jnp.float32)
        C_, P, D = trainable["ctx"].shape
        tiled = _tile_bank(bank, B)
        cmask = bank.class_mask
        ctx_dtype = trainable["ctx"].dtype

        def view_logits(ctx_b):  # [B, C, P, D] -> [B, V, C]
            tf, _ = text_features_with_attribution(
                clip_params,
                ctx_b.reshape(B * C_, P, D).astype(ctx_dtype),
                tiled,
                clip_cfg,
                prompt_cfg,
                trainable["adjustor"],
            )
            logits = scale * jnp.einsum(
                "bve,bce->bvc",
                vf,
                tf.reshape(B, C_, -1).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return jnp.where(cmask[None, None, :], logits, NEG_INF)

        def loss_fn(ctx_b):
            logits = view_logits(ctx_b)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ent_b = _selected_marginal_entropy(logp, K)  # [B]
            return ent_b.sum(), (ent_b, logits[:, 0])

        ctx = jnp.broadcast_to(
            trainable["ctx"].astype(jnp.float32)[None], (B, C_, P, D)
        )
        ent_before = None
        base_logits = None
        opt_state = opt.init(ctx)
        for _ in range(steps):
            (_, (ent_b, clean0)), g = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ctx)
            if ent_before is None:
                ent_before = (ent_b * bm).sum() / bm_sum
                base_logits = clean0  # initial-context clean-view logits
            updates, opt_state = opt.update(g, opt_state, ctx)
            ctx = optax.apply_updates(ctx, updates)

        logits = view_logits(ctx)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ent_after = (
            _selected_marginal_entropy(logp, K) * bm
        ).sum() / bm_sum
        if ent_before is None:  # steps == 0: tuned == untuned
            ent_before = ent_after
            base_logits = logits[:, 0]
        return logits[:, 0], {
            "entropy_before": ent_before,
            "entropy_after": ent_after,
            "baseline_logits": base_logits,
        }

    return predict


def evaluate_tpt(
    model,
    samples,
    *,
    tpt: TPTConfig = TPTConfig(),
    batch_size: int = 16,
    seed: int = 0,
    verbose: bool = True,
) -> Dict[str, float]:
    """Run TPT over a labeled sample list -> accuracy + entropy telemetry.

    ``model`` is a ``FullModel`` (template-initialized context reproduces the
    paper's zero-shot setting; a trained prompt checkpoint gives TPT-on-top).
    Returns ``{"accuracy", "baseline_accuracy", "entropy_before",
    "entropy_after"}`` — baseline is the untuned (initial-context)
    clean-view prediction, read from the main program's ``baseline_logits``
    aux so no second compile or image-tower pass is paid for it.
    """
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.data.imagefolder import Loader

    cfg = model.clip_cfg
    predict = make_tpt_predict_fn(cfg, model.prompt_cfg, tpt)
    loader = Loader(samples, batch_size, shuffle=False, image_size=cfg.image_size)
    bank = model.prompt_learner.bank

    correct = base_correct = total = 0
    e_before: List[float] = []
    e_after: List[float] = []
    for bi, (images, labels, mask) in enumerate(loader):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), bi)
        images = jnp.asarray(images)
        jmask = jnp.asarray(mask)
        logits, aux = predict(
            model.clip_params, model.trainable, bank, images, rng, jmask
        )
        pred = np.asarray(logits).argmax(-1)
        base_pred = np.asarray(aux["baseline_logits"]).argmax(-1)
        labels, mask = np.asarray(labels), np.asarray(mask)
        correct += int(((pred == labels) & mask).sum())
        base_correct += int(((base_pred == labels) & mask).sum())
        total += int(mask.sum())
        e_before.append(float(aux["entropy_before"]))
        e_after.append(float(aux["entropy_after"]))
    out = {
        "accuracy": 100.0 * correct / max(total, 1),
        "baseline_accuracy": 100.0 * base_correct / max(total, 1),
        "entropy_before": float(np.mean(e_before)) if e_before else float("nan"),
        "entropy_after": float(np.mean(e_after)) if e_after else float("nan"),
    }
    if verbose:
        log.info(
            "tpt: %.2f%% (baseline %.2f%%), entropy %.4f -> %.4f "
            "(%d views, %d selected, %d step%s)",
            out["accuracy"], out["baseline_accuracy"],
            out["entropy_before"], out["entropy_after"],
            tpt.n_views, tpt.n_selected, tpt.steps,
            "" if tpt.steps == 1 else "s",
        )
    return out


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--val-root", required=True, help="labeled ImageFolder")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--ckpt", default=None,
                   help="trained prompt checkpoint (TPT-on-top; default is "
                        "the template-initialized zero-shot setting)")
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--views", type=int, default=16)
    p.add_argument("--select-frac", type=float, default=0.25)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--aug-scale-min", type=float, default=0.3)
    p.add_argument("--hflip", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax

    from tapclip_tpu.config import MODEL_PRESETS, PromptConfig, preset
    from tapclip_tpu.data.imagefolder import ImageFolderIndex
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.featurize import load_clip_params
    from tapclip_tpu.models.model_wrapper import FullModel

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    params = load_clip_params(cfg, args.pretrained)
    index = ImageFolderIndex.scan(args.val_root)
    model = FullModel(
        index.classes, params, cfg,
        prompt_cfg=PromptConfig(max_classes=max(8, len(index.classes))),
        tokenizer=get_tokenizer(args.bpe_path),
        rng=jax.random.PRNGKey(args.seed),
    )
    if args.ckpt:
        from tapclip_tpu.utils.checkpoint import apply_prompt_checkpoint

        apply_prompt_checkpoint(model, args.ckpt)

    tpt = TPTConfig(
        n_views=args.views,
        select_frac=args.select_frac,
        steps=args.steps,
        lr=args.lr,
        aug_scale_min=args.aug_scale_min,
        hflip=args.hflip,
    )
    return evaluate_tpt(
        model, index.samples, tpt=tpt, batch_size=args.batch_size,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
