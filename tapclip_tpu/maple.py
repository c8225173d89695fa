"""MaPLe: multi-modal prompt learning (coupled text + vision prompts).

MaPLe (Khattak et al., CVPR 2023) extends text-side prompt tuning (the
reference's only axis, ``/root/reference/train.py``) to BOTH towers and
couples them: deep shared text prompts overwrite the context-token slots at
text blocks ``1..J-1``, and per-layer linear projections ``F_k`` of the text
prompts are inserted as vision prompts (VPT placement) at vision blocks
``0..J-1``.  Layer 0's text prompts are TAP-CLIP's per-class context; its
vision projection takes the class-masked mean context (identical to every
row at template init — the paper's shared-ctx behavior — and coupled to the
tuned context thereafter).

Because the vision tower sees trainable prompts, image features CANNOT be
cached across steps (unlike every other prompt-tuning path here) — training
runs the full image tower per step.  Few-shot sets are small, so this stays
cheap; the forward is the same fused-kernel tower as pretraining.

The trained state lives in ``FullModel.trainable`` under ``"ctx"`` and
``"maple"`` and is checkpointed by ``save_prompt_checkpoint`` like any other
trainable tree.

Usage:
    python -m tapclip_tpu.maple --train-root .../Real_World --shots 16 \\
        --depth 3 --model ViT-B-16 --pretrained ckpt/
"""

from __future__ import annotations

import argparse
import logging
from dataclasses import replace
from typing import Dict, List, Optional, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")


def make_maple_train_step(clip_cfg, prompt_cfg, optimizer):
    """Jitted raw-image train step over the ("ctx", "maple") subset.

    ``clip_params`` is a step ARGUMENT (never closed over — a closure would
    bake the weights into the program as literals).
    """
    import jax
    import optax

    from tapclip_tpu.models.model_wrapper import full_model_forward

    keys = ("ctx", "maple")

    @jax.jit
    def step(clip_params, params, opt_state, bank, images, labels, mask):
        sub = {k: params[k] for k in keys}
        rest = {k: v for k, v in params.items() if k not in keys}

        def loss_fn(sub):
            out = full_model_forward(
                clip_params,
                {**rest, **sub},
                bank,
                images,
                labels,
                clip_cfg=clip_cfg,
                prompt_cfg=prompt_cfg,
                with_loss=True,
                batch_mask=mask,
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = optimizer.update(grads, opt_state, sub)
        sub = optax.apply_updates(sub, updates)
        return {**rest, **sub}, opt_state, loss

    return step


def fit_maple(
    model,
    train_loader,
    val_loader=None,
    *,
    epochs: int = 20,
    lr: float = 2e-3,
    weight_decay: float = 1e-4,
    patience: int = 0,
    verbose: bool = True,
) -> Dict:
    """Train ctx + maple prompts/projections on raw image batches.

    Mirrors ``trainer.fit_prompt_model``'s loop shape (per-epoch val
    accuracy, best-state tracking, optional patience) but never caches
    image features — see the module docstring.  Returns
    ``{"best_acc", "best_trainable", "acc_history", "loss_history"}``.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tapclip_tpu.utils.eval_metrics import evaluate_accuracy

    if model.prompt_cfg.maple_depth <= 0:
        raise ValueError("fit_maple requires PromptConfig.maple_depth >= 1")
    optimizer = optax.adamw(lr, weight_decay=weight_decay)
    params = dict(model.trainable)
    opt_state = optimizer.init({k: params[k] for k in ("ctx", "maple")})
    step = make_maple_train_step(model.clip_cfg, model.prompt_cfg, optimizer)
    bank = model.prompt_learner.bank
    clip_params = model.clip_params

    best_acc, best_trainable = 0.0, dict(params)
    acc_hist: List[float] = []
    loss_hist: List[float] = []
    patience_ctr = 0
    for epoch in range(1, epochs + 1):
        epoch_loss, n_batches = 0.0, 0
        for images, labels, mask in train_loader:
            params, opt_state, loss = step(
                clip_params, params, opt_state, bank,
                jnp.asarray(images), jnp.asarray(labels), jnp.asarray(mask),
            )
            epoch_loss += float(loss)
            n_batches += 1
        avg_loss = epoch_loss / max(n_batches, 1)
        loss_hist.append(avg_loss)
        model.trainable = params
        if val_loader is not None:
            acc = evaluate_accuracy(model, val_loader, verbose=False)
            acc_hist.append(acc)
            if verbose:
                log.info("[Epoch %d] \U0001f3cb️ Avg Train Loss: %.4f", epoch, avg_loss)
                log.info("[Epoch %d] \U0001f9ea Val Accuracy: %.2f%%", epoch, acc)
            if acc > best_acc:
                best_acc, best_trainable = acc, dict(params)
                patience_ctr = 0
            else:
                patience_ctr += 1
                if patience and patience_ctr >= patience:
                    break
        elif verbose:
            log.info("[Epoch %d] \U0001f3cb️ Avg Train Loss: %.4f", epoch, avg_loss)
    if val_loader is None:
        best_trainable = dict(params)
        best_acc = float("nan")
    return {
        "best_acc": best_acc,
        "best_trainable": best_trainable,
        "acc_history": acc_hist,
        "loss_history": loss_hist,
    }


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--train-root", required=True, help="ImageFolder (few-shot source)")
    p.add_argument("--val-root", default=None)
    p.add_argument("--shots", type=int, default=16)
    p.add_argument("--depth", type=int, default=3, help="MaPLe prompt depth J")
    p.add_argument("--prompt-len", type=int, default=2,
                   help="tokens per prompt (the paper uses short contexts)")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--save", default=None, help="Orbax checkpoint dir for the best state")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax

    from tapclip_tpu.config import MODEL_PRESETS, PromptConfig, preset
    from tapclip_tpu.data.imagefolder import (
        ImageFolderIndex,
        Loader,
        few_shot_split,
    )
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.featurize import load_clip_params
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.utils.eval_metrics import evaluate_accuracy

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    params = load_clip_params(cfg, args.pretrained)
    index = ImageFolderIndex.scan(args.train_root)
    class_names = index.classes
    split = few_shot_split(index, class_names, args.shots, seed=args.seed)
    if args.val_root:
        val_index = ImageFolderIndex.scan(args.val_root)
        val_samples = [
            (path, index.class_to_idx[val_index.classes[raw]])
            for path, raw in val_index.samples
            if val_index.classes[raw] in index.class_to_idx
        ]
    else:
        val_samples = split.val

    prompt_cfg = PromptConfig(
        maple_depth=args.depth,
        prompt_len=args.prompt_len,
        max_classes=max(8, len(class_names)),
    )
    model = FullModel(
        class_names, params, cfg,
        prompt_cfg=prompt_cfg,
        tokenizer=get_tokenizer(args.bpe_path),
        rng=jax.random.PRNGKey(args.seed),
    )
    mk = dict(image_size=cfg.image_size, output_dtype="uint8")
    train_loader = Loader(split.train, args.batch_size, shuffle=True,
                          seed=args.seed, **mk)
    val_loader = Loader(val_samples, args.batch_size, shuffle=False, **mk)

    acc0 = evaluate_accuracy(model, val_loader, verbose=False)
    log.info("maple: depth=%d, %d shots x %d classes, init acc %.2f%%",
             args.depth, args.shots, len(class_names), acc0)
    res = fit_maple(
        model, train_loader, val_loader,
        epochs=args.epochs, lr=args.lr, weight_decay=args.weight_decay,
        patience=args.patience,
    )
    model.trainable = res["best_trainable"]
    out = {"init_acc": acc0, "best_acc": res["best_acc"],
           "loss_history": res["loss_history"]}
    if args.save:
        from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint

        save_prompt_checkpoint(
            args.save,
            trainable=model.trainable,
            bank=model.prompt_learner.bank,
            class_names=list(model.class_names),
        )
        out["checkpoint"] = args.save
    log.info("maple: init %.2f%% -> best %.2f%%", acc0, res["best_acc"])
    return out


if __name__ == "__main__":
    main()
