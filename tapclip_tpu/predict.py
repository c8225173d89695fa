"""Batch inference: classify a folder of UNLABELED images with tuned prompts.

The missing fourth deployment surface.  The reference can only score labeled
``ImageFolder`` datasets through its eval drivers
(``/root/reference/test_cross_domain.py:72-85`` — accuracy over a val
loader); classifying a directory of plain images requires writing a loop by
hand.  This driver is that loop, TPU-shaped, sharing the serving semantics:

- adjusted class-text features computed ONCE (image-independent attribution
  identity — ``models/model_wrapper.py``), then the whole corpus runs
  through a single never-retracing ``classify`` executable (frozen tower +
  cached features), exactly ``serve.py``'s predict math;
- fixed batch size with masked tail padding, uint8 host->device transport,
  decode-ahead prefetch — the ``featurize`` corpus contract;
- outputs ``predictions.csv`` (``path,label,score[,top{2..k}...]``) and, on
  request, ``predictions.json`` with full top-k + the class-level
  attribution matrix.

Usage:
    python -m tapclip_tpu.predict --image-root photos/ --out preds/ \\
        --model ViT-B-32 --pretrained converted/ --ckpt results/.../best \\
        --classes Backpack Pen Mug --top-k 3
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from tapclip_tpu.config import MODEL_PRESETS, preset

log = logging.getLogger("tapclip_tpu")

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif", ".tif",
                    ".tiff")


def list_images(root: str) -> List[str]:
    """Every image file under ``root``, recursively, sorted for determinism."""
    out: List[str] = []
    for dirpath, _, filenames in os.walk(root):
        for fn in filenames:
            if fn.lower().endswith(IMAGE_EXTENSIONS):
                out.append(os.path.join(dirpath, fn))
    return sorted(out)


def iter_image_batches(
    paths: List[str],
    batch_size: int,
    image_size: int,
    output_dtype: str,
    fast_decode: bool = False,
) -> Iterator[Tuple[np.ndarray, List[str], np.ndarray]]:
    """Decode ``paths`` into fixed-size ``(images, paths, mask)`` batches.

    Rides ``imagefolder.Loader`` (labels carry the corpus index), so the
    corpus gets the native threaded C++ decode when it builds, per-image
    PIL fallback, and corrupt-file skip — a bad frame never kills a run.
    """
    from tapclip_tpu.data.imagefolder import Loader

    loader = Loader(
        [(p, i) for i, p in enumerate(paths)],
        batch_size,
        shuffle=False,
        image_size=image_size,
        output_dtype=output_dtype,
        fast_decode=fast_decode,
    )
    for images, idx, mask in loader:
        # mask can be False mid-batch (decode failure), not just the padded
        # tail — metas lists the REAL rows in batch order.
        metas = [paths[int(i)] for i, m in zip(idx, mask) if m]
        yield images, metas, mask


def make_classify_fn(cfg, mesh=None):
    """Jitted ``(params, text_feats[C,E], logit_scale, class_mask,
    images) -> probs [B,C]`` — serve.py's predict math + softmax."""
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.models import clip as clip_model

    def classify(params, text_feats, logit_scale, class_mask, images):
        f = clip_model.encode_image(params, cfg, images)
        img = clip_model.l2_normalize(f).astype(jnp.float32)
        logits = jnp.exp(logit_scale).astype(jnp.float32) * (
            img @ text_feats.astype(jnp.float32).T
        )
        logits = jnp.where(class_mask[None, :], logits, jnp.float32(-1e30))
        return jax.nn.softmax(logits, axis=-1)

    if mesh is None:
        return jax.jit(classify)
    from tapclip_tpu.parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    return jax.jit(
        classify,
        in_shardings=(rep, rep, rep, rep, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def predict_corpus(
    model,
    paths: List[str],
    *,
    batch_size: int = 256,
    top_k: int = 1,
    uint8_transfer: bool = True,
    mesh=None,
    prefetch_depth: int = 2,
    fast_decode: bool = False,
    saliency: Optional[str] = None,
    saliency_dir: Optional[str] = None,
):
    """Classify ``paths`` -> (rows, attribution).

    ``saliency``: ``"rollout"`` or ``"last"`` — additionally compute the
    vision patch-saliency grid per image and write a heatmap-overlay PNG
    into ``saliency_dir`` (each row gains a ``"saliency_png"`` key).
    Forces uint8 transport (the overlay needs display-space pixels).

    rows: one ``{"path", "labels": [k], "scores": [k]}`` per decodable
    image, corpus order.  attribution: class-level ``[n_cls, P]`` (the
    image-independent scores the adjusted features were built with) — or
    ``None`` for CoCoOp models (``PromptConfig.image_conditioned``), where
    attribution is per-(sample, class) by design.

    CoCoOp models bypass the cached-text-feature fast path entirely (the
    text features are per-sample there — the serving-cache invariant) and
    run the full fused forward per batch instead; ``mesh`` applies to the
    cached path only.
    """
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.data.prefetch import background_iter
    from tapclip_tpu.models.model_wrapper import (
        full_model_forward,
        text_features_with_attribution,
    )

    cfg, pcfg = model.clip_cfg, model.prompt_cfg
    bank = model.prompt_learner.bank
    n_cls = model.n_cls
    top_k = max(1, min(top_k, n_cls))

    # params/bank travel as jit ARGUMENTS — closing over them bakes the
    # full weight tree into the program as literals (the documented
    # HTTP-413 trap on the tunneled compile service; see CLAUDE.md).
    if pcfg.image_conditioned:
        attribution = None
        full_fn = jax.jit(
            lambda p, tr, bk, imgs: jax.nn.softmax(
                full_model_forward(
                    p, tr, bk, imgs, None, clip_cfg=cfg, prompt_cfg=pcfg
                )["logits"],
                axis=-1,
            )
        )

        def probs_fn(imgs):
            return np.asarray(
                full_fn(model.clip_params, model.trainable, bank, imgs)
            )

    else:
        text_fn = jax.jit(
            lambda p, ctx, bk, adj: text_features_with_attribution(
                p, ctx, bk, cfg, pcfg, adj
            )
        )
        feats, attribution = text_fn(
            model.clip_params, model.trainable["ctx"], bank,
            model.trainable["adjustor"],
        )
        attribution = np.asarray(attribution)[:n_cls]
        scale = jnp.asarray(model.trainable["logit_scale"], jnp.float32)
        classify = make_classify_fn(cfg, mesh)

        def probs_fn(imgs):
            return np.asarray(
                classify(model.clip_params, feats, scale, bank.class_mask,
                         imgs)
            )

    if saliency:
        if saliency not in ("rollout", "last"):
            raise ValueError(f"unknown saliency method {saliency!r}")
        if saliency_dir is None:
            raise ValueError("saliency requires saliency_dir")
        os.makedirs(saliency_dir, exist_ok=True)
        uint8_transfer = True  # the overlay needs display-space pixels

    dtype = "uint8" if uint8_transfer else "float32"
    batches = iter_image_batches(
        paths, batch_size, cfg.image_size, dtype, fast_decode
    )
    rows = []
    names = list(model.class_names)
    for images, metas, mask in background_iter(batches, depth=prefetch_depth):
        # slice to the REAL class count before ranking: padded slots carry
        # probability exactly 0.0 and an unstable argsort could otherwise
        # rank one above a tied real class (names[j] would then be out of
        # range) — serve.py slices logits[:, :n_cls] for the same reason
        xb = jnp.asarray(images)
        probs = probs_fn(xb)[mask][:, :n_cls]
        order = np.argsort(-probs, axis=-1)[:, :top_k]
        grids = None
        if saliency:
            from tapclip_tpu.utils.plotting import save_saliency_overlay
            from tapclip_tpu.utils.saliency import patch_saliency

            # Chunked: the rollout materializes per-layer [b, H, T, T]
            # attention stacks, so a full 256-image batch would blow HBM on
            # the bigger towers (ViT-L: ~26 GB at b=256). 16 at a time keeps
            # it <0.4 GB while still amortizing dispatch.
            masked_images = np.asarray(images)[np.asarray(mask)]
            grids = np.concatenate([
                patch_saliency(model.clip_params, cfg,
                               jnp.asarray(masked_images[s : s + 16]),
                               method=saliency)
                for s in range(0, len(masked_images), 16)
            ]) if len(masked_images) else np.zeros((0, 1, 1))
        for bi, (path, idx, p) in enumerate(zip(metas, order, probs)):
            row = {
                "path": path,
                "labels": [names[j] for j in idx],
                "scores": [float(p[j]) for j in idx],
            }
            if grids is not None:
                stem = os.path.splitext(os.path.basename(path))[0]
                png = os.path.join(
                    saliency_dir, f"{len(rows):05d}_{stem}_saliency.png"
                )
                # uint8 transport is forced above
                disp = masked_images[bi].astype(np.float32) / 255.0
                row["saliency_png"] = save_saliency_overlay(
                    disp, grids[bi], png,
                    title=f"{row['labels'][0]} ({saliency})",
                )
            rows.append(row)
    return rows, attribution


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--image-root", required=True,
                   help="directory of images (recursive; no labels needed)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--model", default="ViT-B-16", choices=sorted(MODEL_PRESETS))
    p.add_argument("--preset", default=None,
                   help="experiment preset providing model config + classes "
                        "(overrides --model; 'tiny' for tests)")
    p.add_argument("--pretrained", default=None,
                   help="Orbax dir or open_clip .bin (random weights if unset)")
    p.add_argument("--ckpt", default=None,
                   help="tuned prompt checkpoint (Orbax dir or reference .pt)")
    p.add_argument("--classes", nargs="+", default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--top-k", type=int, default=1)
    p.add_argument("--json", action="store_true",
                   help="also write predictions.json (full top-k + "
                        "class-level attribution)")
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--int8", action="store_true",
                   help="quantized W8A8 tower (see docs/PERF.md)")
    p.add_argument("--saliency", default=None, choices=["rollout", "last"],
                   help="write a patch-saliency overlay PNG per image into "
                        "OUT/saliency/ (ViT: attention rollout or last "
                        "layer; RN: attnpool map)")
    p.add_argument("--fast-decode", action="store_true",
                   help="DCT-scaled JPEG decode in the native pipeline "
                        "(~2x decode on web-size JPEGs, near- but not "
                        "bit-identical pixels)")
    p.add_argument("--uint8-transfer", dest="uint8_transfer",
                   action="store_true", default=True)
    p.add_argument("--no-uint8-transfer", dest="uint8_transfer",
                   action="store_false")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel devices (0 = single device)")
    p.add_argument("--platform", default=None, help="e.g. cpu (tests)")
    return p


def main(argv: Optional[List[str]] = None) -> dict:
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    if args.preset:
        ecfg = preset(args.preset)
    else:
        from tapclip_tpu.config import ExperimentConfig

        ecfg = ExperimentConfig(model=MODEL_PRESETS[args.model])
    import dataclasses

    if args.classes:
        ecfg = dataclasses.replace(ecfg, class_names=tuple(args.classes))
    if args.pretrained:
        ecfg = dataclasses.replace(ecfg, pretrained_path=args.pretrained)
    if args.int8:
        ecfg = dataclasses.replace(
            ecfg, model=ecfg.model.replace(quantize_tower=True)
        )

    from tapclip_tpu.train import build_model

    model, _ = build_model(ecfg, bpe_path=args.bpe_path)
    if args.ckpt:
        from tapclip_tpu.utils.checkpoint import apply_prompt_checkpoint

        apply_prompt_checkpoint(model, args.ckpt)
        log.info("loaded tuned prompts from %s", args.ckpt)

    mesh = None
    if args.dp:
        from tapclip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp)
        if args.batch_size % args.dp:
            raise SystemExit("--batch-size must divide by --dp")

    paths = list_images(args.image_root)
    if not paths:
        raise SystemExit(f"no images found under {args.image_root}")
    log.info("classifying %d images into %d classes (top-%d)",
             len(paths), model.n_cls, args.top_k)

    rows, attribution = predict_corpus(
        model, paths, batch_size=args.batch_size, top_k=args.top_k,
        uint8_transfer=args.uint8_transfer, mesh=mesh,
        fast_decode=args.fast_decode,
        saliency=args.saliency,
        saliency_dir=os.path.join(args.out, "saliency") if args.saliency
        else None,
    )

    os.makedirs(args.out, exist_ok=True)
    k = max(1, min(args.top_k, model.n_cls))
    csv_path = os.path.join(args.out, "predictions.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        header = ["path", "label", "score"]
        for j in range(2, k + 1):
            header += [f"label_{j}", f"score_{j}"]
        w.writerow(header)
        for r in rows:
            line = [r["path"]]
            for lab, sc in zip(r["labels"], r["scores"]):
                line += [lab, f"{sc:.6f}"]
            w.writerow(line)
    result = {"n": len(rows), "csv": csv_path}
    if args.json:
        json_path = os.path.join(args.out, "predictions.json")
        with open(json_path, "w") as f:
            json.dump(
                {
                    "classes": list(model.class_names),
                    # None for CoCoOp (per-sample attribution by design)
                    "attribution": None if attribution is None
                    else attribution.tolist(),
                    "predictions": rows,
                },
                f,
                indent=2,
            )
        result["json"] = json_path
    log.info("wrote %d predictions to %s", len(rows), csv_path)
    return result


if __name__ == "__main__":
    main()
