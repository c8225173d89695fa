"""Training driver — rebuild of ``/root/reference/train.py``.

Same workflow (few-shot prompt tuning on one OfficeHome domain, per-epoch val
accuracy, greedy best-state early stopping, accuracy-curve PNG, checkpoint of
the best state) but with a real CLI instead of hardcoded constants
(``train.py:29-39``), seeded splits, jitted fused steps, and feature caching.

Usage:
    python -m tapclip_tpu.train --data-root data/OfficeHome/Real_World \\
        --pretrained open_clip_pytorch_model.bin --num-shots 5
    python -m tapclip_tpu.train --preset tiny --synthetic-data  # smoke run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import tempfile
from typing import List, Optional

import numpy as np

from tapclip_tpu.config import (
    MODEL_PRESETS,
    ExperimentConfig,
    PromptConfig,
    TrainConfig,
    preset,
)


def build_argparser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--preset", default="reference_train", help="experiment preset")
    p.add_argument("--model", default=None, choices=list(MODEL_PRESETS), help="CLIP variant")
    p.add_argument("--data-root", default=None)
    p.add_argument("--classes", nargs="+", default=None)
    p.add_argument("--pretrained", default=None, help="open_clip .bin/.pt checkpoint")
    p.add_argument("--bpe-path", default=None, help="CLIP BPE merges file")
    p.add_argument("--prompt-len", type=int, default=None)
    p.add_argument("--adjustor", default=None, choices=["scale", "gate", "residual"])
    p.add_argument("--text-mode", default=None, choices=["ref_compat", "idiomatic"])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--kg-lambda", type=float, default=None,
                   help="KgCoOp: anchor learned text features to the "
                        "zero-shot classifier with this weight (0 = the "
                        "reference's CE-only loss)")
    p.add_argument("--prograd-lambda", type=float, default=None,
                   help="ProGrad: project the task gradient off the "
                        "KL(zero-shot || tuned) gradient when they "
                        "conflict (paper uses 1.0; 0 = plain descent)")
    p.add_argument("--scl-lambda", type=float, default=None,
                   help="PromptSRC logit self-regularization: add "
                        "lambda * KL(zero-shot || tuned) to the loss "
                        "(combine with --kg-lambda for the full recipe)")
    p.add_argument("--anchor-templates", nargs="+", default=None,
                   metavar="TPL",
                   help="PromptSRC textual diversity: build the frozen "
                        "zero-shot anchor behind --kg/--scl/--prograd as "
                        "the ensembled mean over these '... {} ...' "
                        "templates instead of the single prompt template")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-shots", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--version", default=None)
    p.add_argument("--output-root", default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force platform (default: whatever JAX picks)")
    p.add_argument("--synthetic-data", action="store_true",
                   help="generate a synthetic ImageFolder (smoke/benchmarks)")
    p.add_argument("--profile-dir", default=None, help="jax.profiler trace dir")
    p.add_argument("--confusion", action="store_true",
                   help="write a validation confusion matrix "
                        "(csv + heatmap PNG) for the best model")
    p.add_argument("--calibrate", action="store_true",
                   help="fit a softmax temperature on the validation set "
                        "(Guo et al. 2017) and report ECE before/after")
    p.add_argument("--resume", default=None,
                   help="Orbax checkpoint dir to resume training from "
                        "(restores prompt params + optimizer state + step)")
    p.add_argument("--save-every", type=int, default=0,
                   help="snapshot params+optimizer state every N epochs "
                        "(preemption-safe; resume with --resume <dir>)")
    p.add_argument("--keep-last-n", type=int, default=2,
                   help="retain the N most recent periodic snapshots")
    p.add_argument("--keep-best-n", type=int, default=0,
                   help="also retain the N best-by-val-accuracy snapshots")
    p.add_argument("--async-save", action="store_true",
                   help="write periodic snapshots on a background thread "
                        "(the train loop never blocks on serialization)")
    p.add_argument("--uint8-transfer", action="store_true",
                   help="ship uint8 pixels host->device (4x less transfer "
                        "bandwidth) and normalize on device — bit-identical "
                        "to the float pipeline")
    return p


def apply_overrides(cfg: ExperimentConfig, args) -> ExperimentConfig:
    model = MODEL_PRESETS[args.model] if args.model else cfg.model
    if args.dtype:
        model = model.replace(dtype=args.dtype)
    prompt = cfg.prompt
    for field, arg in [("prompt_len", args.prompt_len), ("adjustor_method", args.adjustor),
                       ("text_mode", args.text_mode)]:
        if arg is not None:
            prompt = dataclasses.replace(prompt, **{field: arg})
    train = cfg.train
    for field, arg in [("epochs", args.epochs), ("patience", args.patience),
                       ("lr", args.lr), ("weight_decay", args.weight_decay),
                       ("batch_size", args.batch_size), ("num_shots", args.num_shots),
                       ("seed", args.seed), ("kg_lambda", args.kg_lambda),
                       ("prograd_lambda", args.prograd_lambda),
                       ("scl_lambda", args.scl_lambda),
                       ("anchor_templates",
                        tuple(args.anchor_templates)
                        if args.anchor_templates is not None else None)]:
        if arg is not None:
            train = dataclasses.replace(train, **{field: arg})
    return dataclasses.replace(
        cfg,
        model=model,
        prompt=prompt,
        train=train,
        class_names=tuple(args.classes) if args.classes else cfg.class_names,
        data_root=args.data_root or cfg.data_root,
        pretrained_path=args.pretrained or cfg.pretrained_path,
        version=args.version or cfg.version,
        output_root=args.output_root or cfg.output_root,
    )


def setup_platform(platform: Optional[str]):
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def build_model(cfg: ExperimentConfig, *, bpe_path: Optional[str] = None, rng_seed: int = 0):
    """Create (FullModel, preprocess_fn) — the rebuild of CLIPWrapper+FullModel
    construction (train.py:54-63)."""
    import jax

    from tapclip_tpu.data.preprocess import make_preprocess
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import FullModel

    log = logging.getLogger("tapclip_tpu")
    if cfg.pretrained_path:
        import jax.numpy as jnp

        if os.path.isdir(cfg.pretrained_path):
            # Orbax tree (e.g. from pretrain_cli or scripts/convert_checkpoint)
            import orbax.checkpoint as ocp

            params = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(cfg.pretrained_path)
            )
        else:
            from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

            params = load_openclip_checkpoint(cfg.pretrained_path, cfg.model)
        params = clip_model.ensure_vpt_params(params, cfg.model, seed=rng_seed)
        params = jax.tree.map(jnp.asarray, params)
        log.info("loaded pretrained CLIP weights from %s", cfg.pretrained_path)
    else:
        params = clip_model.init_clip_params(jax.random.PRNGKey(rng_seed), cfg.model)
        log.warning("no --pretrained given: using RANDOM CLIP weights")

    tokenizer = get_tokenizer(bpe_path, cfg.model.context_length)
    if tokenizer.is_fallback:
        log.warning(
            "BPE merge table not found (set --bpe-path or TAPCLIP_BPE_PATH); "
            "using byte-level fallback tokenizer"
        )
    model = FullModel(
        list(cfg.class_names),
        params,
        cfg.model,
        prompt_cfg=cfg.prompt,
        tokenizer=tokenizer,
        attr_lambda=cfg.train.attr_lambda,
        stab_lambda=cfg.train.stab_lambda,
        rng=jax.random.PRNGKey(cfg.train.seed),
    )
    return model, make_preprocess(cfg.model.image_size)


def maybe_synthetic_root(cfg: ExperimentConfig, synthetic: bool) -> str:
    if not synthetic:
        return cfg.data_root
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = tempfile.mkdtemp(prefix="tapclip_synth_")
    build_imagefolder(root, list(cfg.class_names), per_class=24,
                      image_size=cfg.model.image_size, seed=cfg.train.seed)
    return root


def main(argv: Optional[List[str]] = None) -> dict:
    args = build_argparser(__doc__).parse_args(argv)
    setup_platform(args.platform)
    cfg = apply_overrides(preset(args.preset), args)

    from tapclip_tpu.data.imagefolder import get_dataloaders
    from tapclip_tpu.trainer import cache_features, evaluate_cached, fit_prompt_model
    from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint
    from tapclip_tpu.utils.logging_utils import (
        generate_output_paths,
        maybe_profile,
        setup_logging,
    )
    from tapclip_tpu.utils.plotting import save_accuracy_curve

    paths = generate_output_paths(cfg.version, cfg.output_root)
    log = setup_logging(os.path.join(paths["log_dir"], f"{cfg.version}_train.log"))
    log.info("config: %s", cfg)

    model, preprocess = build_model(cfg, bpe_path=args.bpe_path)
    # Log trainable parameters (train.py:69-72).
    import jax

    log.info("\U0001f527 Trainable Parameters:")
    for i, name in enumerate(model.class_names):
        # One line per class-context row, matching the reference's per-param
        # listing of context_bank entries (train.py:69-72).
        log.info(" - prompt_learner.context_bank.%s | shape: %s",
                 name, tuple(model.trainable["ctx"].shape[1:]))

    data_root = maybe_synthetic_root(cfg, args.synthetic_data)
    train_loader, val_loader = get_dataloaders(
        data_root,
        list(cfg.class_names),
        batch_size=cfg.train.batch_size,
        num_shots=cfg.train.num_shots,
        preprocess=None if args.uint8_transfer else preprocess,
        seed=cfg.train.seed,
        image_size=cfg.model.image_size,
        output_dtype="uint8" if args.uint8_transfer else "float32",
    )
    if train_loader is None:
        # zero-shot: single eval pass
        val_cache = cache_features(model, val_loader)
        acc, per_class = evaluate_cached(model, val_cache)
        log.info("zero-shot accuracy: %.2f%%", acc)
        return {"best_acc": acc, "paths": paths}

    resume_state = None
    if args.resume:
        from tapclip_tpu.utils.checkpoint import restore_prompt_checkpoint

        tree = restore_prompt_checkpoint(args.resume)
        resume_state = {
            "trainable": tree["trainable"],
            "opt_state": tree.get("opt_state"),
            "step": tree["meta"].get("step", 0),
        }
        log.info("resuming from %s (step %s)", args.resume, resume_state["step"])

    from tapclip_tpu.utils.checkpoint import CheckpointManager

    ckpt_mgr = CheckpointManager(
        os.path.join(paths["model_dir"], "checkpoints"),
        keep_last_n=args.keep_last_n,
        keep_best_n=args.keep_best_n,
        mode="max",
        async_save=args.async_save,
    )

    def _snapshot(epoch, state, metric=None):
        p = ckpt_mgr.save(
            step=int(state.step),
            trainable=state.params,
            bank=model.prompt_learner.bank,
            class_names=model.class_names,
            opt_state=state.opt_state,
            metric=metric,
            extra_meta={"epoch": epoch},
        )
        log.info("periodic checkpoint at epoch %d -> %s", epoch, p)

    with maybe_profile(args.profile_dir):
        result = fit_prompt_model(
            model, train_loader, val_loader, cfg.train,
            resume_state=resume_state,
            checkpoint_cb=_snapshot if args.save_every else None,
            checkpoint_every=args.save_every,
        )
    ckpt_mgr.close()

    log.info("best val accuracy: %.2f%% (after %d epochs)",
             result.best_acc, result.epochs_run)

    model.trainable = result.best_trainable
    ckpt_path = os.path.join(
        paths["model_dir"], f"best_model_{cfg.version}_acc{result.best_acc:.2f}"
    )
    save_prompt_checkpoint(
        ckpt_path,
        trainable=result.best_trainable,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        opt_state=(result.final_state.opt_state if result.final_state else None),
        step=(int(result.final_state.step) if result.final_state else result.epochs_run),
        extra_meta={"best_acc": result.best_acc, "preset": args.preset},
    )
    log.info("\U0001f4e6 Model saved: %s", ckpt_path)

    plot_path = os.path.join(
        paths["plot_dir"], f"{cfg.version}_acc_curve_acc{result.best_acc:.2f}.png"
    )
    save_accuracy_curve(result.acc_history, result.per_class_history, plot_path)
    log.info("\U0001f4ca Accuracy plot saved to %s", plot_path)

    # Attribution chart for the trained prompts (interpretability artifact).
    from tapclip_tpu.models.model_wrapper import text_features_with_attribution
    from tapclip_tpu.utils.plotting import save_attribution_chart

    _, attribution = text_features_with_attribution(
        model.clip_params,
        model.trainable["ctx"],
        model.prompt_learner.bank,
        cfg.model,
        cfg.prompt,
        model.trainable["adjustor"],
    )
    attr_path = save_attribution_chart(
        np.asarray(attribution)[: model.n_cls],
        model.class_names,
        os.path.join(paths["plot_dir"], f"{cfg.version}_attribution.png"),
    )
    log.info("attribution chart saved to %s", attr_path)

    if args.confusion or args.calibrate:
        # ONE val pass feeds both readouts (each extra pass re-decodes and
        # re-encodes the whole val set — a real cost on the tunnel).
        from tapclip_tpu.utils.calibration import (
            calibrate_from_logits,
            collect_logits,
        )

        logits, labels, vmask = collect_logits(model, val_loader)
        if args.confusion:
            from tapclip_tpu.utils.eval_metrics import confusion_from_logits
            from tapclip_tpu.utils.plotting import save_confusion_matrix

            cm = confusion_from_logits(logits, labels, vmask, model.n_cls)
            cm_csv = os.path.join(
                paths["csv_dir"], f"{cfg.version}_confusion.csv"
            )
            np.savetxt(cm_csv, cm, fmt="%d", delimiter=",",
                       header=",".join(model.class_names), comments="")
            cm_png = save_confusion_matrix(
                cm, model.class_names,
                os.path.join(paths["plot_dir"], f"{cfg.version}_confusion.png"),
            )
            log.info("confusion matrix saved to %s / %s", cm_csv, cm_png)
        if args.calibrate:
            calib = calibrate_from_logits(logits, labels, vmask)
            log.info(
                "calibration: T=%.3f  ECE %.4f -> %.4f (n=%d)",
                calib["temperature"], calib["ece_before"], calib["ece_after"],
                calib["n"],
            )
            with open(
                os.path.join(paths["csv_dir"], "calibration.json"), "w"
            ) as f:
                json.dump(calib, f, indent=2)

    with open(os.path.join(paths["csv_dir"], "history.json"), "w") as f:
        json.dump(
            {"acc": result.acc_history, "loss": result.loss_history}, f, indent=2
        )
    return {"best_acc": result.best_acc, "paths": paths, "ckpt": ckpt_path,
            "result": result}


if __name__ == "__main__":
    main()
