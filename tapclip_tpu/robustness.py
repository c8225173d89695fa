"""Corruption-robustness evaluation (the ImageNet-C protocol).

Evaluates a classifier on corrupted copies of a labeled ImageFolder at 5
severities per corruption (Hendrycks & Dietterich 2019) and reports
per-(corruption, severity) accuracy, the mean corruption accuracy (mCA),
and retention relative to clean accuracy.  The reference has no robustness
readout at all; this extends its eval-driver family
(``/root/reference/test_cross_domain.py``) with the standard one.

TPU-native shape: corruptions are pure jax ops fused INTO the jitted
classify program (``utils/corruptions.py``) — the uint8 val batches are
decoded/transferred ONCE per epoch-pass and re-corrupted on device, so the
tunnel-limited host->device path pays nothing extra for the 5-severity
sweep.  Severity rides as a traced argument (one executable per corruption;
``pixelate`` alone re-specializes per severity, its resize shape is static).

Usage:
    python -m tapclip_tpu.robustness --val-root .../Real_World \\
        --model ViT-B-16 --pretrained ckpt/ --ckpt prompts/ --out results/rob
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from tapclip_tpu.utils.corruptions import (
    CORRUPTIONS,
    SEVERITIES,
    STATIC_SEVERITY,
    STOCHASTIC,
)

log = logging.getLogger("tapclip_tpu")


def make_corrupt_classify_fn(cfg, name: Optional[str]):
    """Jitted ``(params, text_feats, logit_scale, class_mask, images_u8,
    severity, rng) -> pred [B]`` with the corruption fused in.

    ``name=None`` is the clean path (plain device normalization).  For
    ``STATIC_SEVERITY`` corruptions the severity is a static argument.
    """
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.data.preprocess import device_normalize
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.utils.corruptions import corrupt_uint8_normalized

    def classify(params, text_feats, logit_scale, class_mask, images_u8,
                 severity, rng):
        if name is None:
            x = device_normalize(images_u8)
        else:
            x = corrupt_uint8_normalized(images_u8, name, severity, rng)
        f = clip_model.encode_image(params, cfg, x)
        img = clip_model.l2_normalize(f).astype(jnp.float32)
        logits = img @ text_feats.astype(jnp.float32).T
        logits = jnp.where(class_mask[None, :], logits, jnp.float32(-1e30))
        return jnp.argmax(logits, axis=-1)

    static = (5,) if (name in STATIC_SEVERITY) else ()
    return jax.jit(classify, static_argnums=static)


def evaluate_robustness(
    model,
    samples,
    *,
    corruptions: Sequence[str] = tuple(CORRUPTIONS),
    severities: Sequence[int] = SEVERITIES,
    batch_size: int = 64,
    seed: int = 0,
    verbose: bool = True,
) -> List[Dict]:
    """Run the sweep -> rows ``[{Corruption, Severity, Accuracy, Retention}]``.

    The first row is the clean pass (``Corruption="clean", Severity=0``);
    Retention is accuracy / clean accuracy.  ``model`` is a ``FullModel``
    (its trained context/adjustor feed the cached text features, exactly
    like ``predict``).
    """
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.data.imagefolder import Loader
    from tapclip_tpu.models.model_wrapper import text_features_with_attribution

    unknown = [c for c in corruptions if c not in CORRUPTIONS]
    if unknown:
        raise KeyError(f"unknown corruptions {unknown}; have {sorted(CORRUPTIONS)}")
    cfg, pcfg = model.clip_cfg, model.prompt_cfg
    if pcfg.image_conditioned:
        raise NotImplementedError(
            "robustness eval uses cached text features; CoCoOp models "
            "recompute text per sample (run predict per corruption instead)"
        )
    if pcfg.maple_depth > 0:
        raise NotImplementedError(
            "robustness eval runs the plain frozen image tower; MaPLe's "
            "trainable vision prompts would be silently dropped — evaluate "
            "maple checkpoints with evaluate_accuracy over a corrupted "
            "loader instead"
        )
    bank = model.prompt_learner.bank

    text_fn = jax.jit(
        lambda p, ctx, bk, adj: text_features_with_attribution(
            p, ctx, bk, cfg, pcfg, adj
        )[0]
    )
    feats = text_fn(model.clip_params, model.trainable["ctx"], bank,
                    model.trainable["adjustor"])
    scale = jnp.asarray(model.trainable["logit_scale"], jnp.float32)

    # Decode the val set ONCE; batches are re-corrupted on device.
    loader = Loader(samples, batch_size, shuffle=False,
                    image_size=cfg.image_size, output_dtype="uint8")
    batches = [(jnp.asarray(i), np.asarray(l), np.asarray(m))
               for i, l, m in loader]

    def accuracy(fn, severity, rng_tag):
        correct = total = 0
        for bi, (images, labels, mask) in enumerate(batches):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), rng_tag * 131 + bi)
            pred = np.asarray(
                fn(model.clip_params, feats, scale, bank.class_mask, images,
                   severity, rng)
            )
            correct += int(((pred == labels) & mask).sum())
            total += int(mask.sum())
        return 100.0 * correct / max(total, 1)

    rows: List[Dict] = []
    t0 = time.monotonic()
    clean_fn = make_corrupt_classify_fn(cfg, None)
    clean = accuracy(clean_fn, 0, 0)
    rows.append({"Corruption": "clean", "Severity": 0,
                 "Accuracy": round(clean, 2), "Retention": 1.0})
    if verbose:
        log.info("robustness: clean %.2f%% (%.1fs)", clean, time.monotonic() - t0)

    for ci, name in enumerate(corruptions, start=1):
        fn = make_corrupt_classify_fn(cfg, name)
        for sev in severities:
            sev_arg = int(sev) if name in STATIC_SEVERITY else jnp.int32(sev)
            acc = accuracy(fn, sev_arg, ci * 17 + int(sev))
            rows.append({
                "Corruption": name,
                "Severity": int(sev),
                "Accuracy": round(acc, 2),
                "Retention": round(acc / max(clean, 1e-9), 4),
            })
            if verbose:
                log.info("robustness: %-16s s%d %6.2f%%", name, sev, acc)
    return rows


def mean_corruption_accuracy(rows: List[Dict]) -> float:
    accs = [r["Accuracy"] for r in rows if r["Corruption"] != "clean"]
    return float(np.mean(accs)) if accs else float("nan")


def save_artifacts(rows: List[Dict], out_dir: str) -> Dict[str, str]:
    """``robustness.csv`` + grouped severity bar chart under ``out_dir``."""
    import pandas as pd

    from tapclip_tpu.utils.plotting import save_cross_domain_bar

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "robustness.csv")
    pd.DataFrame(
        rows, columns=["Corruption", "Severity", "Accuracy", "Retention"]
    ).to_csv(csv_path, index=False)
    chart = save_cross_domain_bar(
        [dict(Domain=r["Corruption"], Shots=f"s{r['Severity']}",
              Accuracy=r["Accuracy"])
         for r in rows if r["Corruption"] != "clean"],
        os.path.join(out_dir, "robustness_bar.png"),
        title="Corruption Robustness (ImageNet-C protocol)",
        bar_width=0.15,
    )
    return {"csv": csv_path, "chart": chart}


def main(argv: Optional[List[str]] = None) -> List[Dict]:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--val-root", required=True, help="labeled ImageFolder")
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS),
                   choices=list(CORRUPTIONS))
    p.add_argument("--severities", nargs="+", type=int,
                   default=list(SEVERITIES))
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--ckpt", default=None,
                   help="trained prompt checkpoint (Orbax dir or .pt)")
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--out", default=None, help="artifact dir (csv + chart)")
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

    rows = evaluate_robustness(
        model, index.samples,
        corruptions=tuple(args.corruptions),
        severities=tuple(args.severities),
        batch_size=args.batch_size,
        seed=args.seed,
    )
    mca = mean_corruption_accuracy(rows)
    log.info("robustness: mean corruption accuracy %.2f%% (clean %.2f%%)",
             mca, rows[0]["Accuracy"])
    if args.out:
        paths = save_artifacts(rows, args.out)
        log.info("robustness artifacts: %s", paths)
    return rows


if __name__ == "__main__":
    main()
