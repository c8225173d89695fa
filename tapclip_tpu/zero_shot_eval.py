"""Standard CLIP zero-shot cross-domain evaluation driver.

BASELINE.json config 1 ("Zero-shot CLIP ViT-B/32 eval on OfficeHome
Real->Clipart") as a first-class workflow: build a template-ensembled
zero-shot classifier once, evaluate every domain, emit the same
``Domain,Shots,Accuracy`` CSV/bar-chart artifacts as the transfer drivers
(rows labeled "Zero-Shot").  This is the path that reproduces the README
zero-shot baselines (47.2/52.1/58.4, ``/root/reference/README.md:57-58``)
given real weights + data.

Usage:
    python -m tapclip_tpu.zero_shot_eval --domain-root data/OfficeHome \\
        --pretrained open_clip_pytorch_model.bin --classes ... [--ensemble]
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

from tapclip_tpu.config import preset
from tapclip_tpu.train import apply_overrides, build_argparser, setup_platform


def main(argv: Optional[List[str]] = None) -> dict:
    p = build_argparser(__doc__)
    p.add_argument("--domains", nargs="+", default=["Real World", "Art", "Clipart", "Product"])
    p.add_argument("--domain-root", default=None)
    p.add_argument("--ensemble", action="store_true",
                   help="use the OpenAI template ensemble instead of a single template")
    p.add_argument("--raw-names", action="store_true",
                   help="keep underscores in class names (strict reference parity)")
    args = p.parse_args(argv)
    setup_platform(args.platform)
    cfg = apply_overrides(preset(args.preset), args)

    import jax.numpy as jnp

    from tapclip_tpu.data.imagefolder import ImageFolderIndex, few_shot_split
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.train import build_model
    from tapclip_tpu.trainer import PathFeatureCache
    from tapclip_tpu.utils.logging_utils import generate_output_paths, setup_logging
    from tapclip_tpu.utils.plotting import save_cross_domain_bar, save_results_csv
    from tapclip_tpu.zero_shot import (
        DEFAULT_TEMPLATES,
        OPENAI_IMAGENET_TEMPLATES_SMALL,
        build_zero_shot_classifier,
    )
    import numpy as np

    paths = generate_output_paths(cfg.version + "_zeroshot", cfg.output_root)
    log = setup_logging(os.path.join(paths["log_dir"], "zero_shot.log"))

    model, preprocess = build_model(cfg, bpe_path=args.bpe_path)
    class_names = list(cfg.class_names)
    templates = OPENAI_IMAGENET_TEMPLATES_SMALL if args.ensemble else DEFAULT_TEMPLATES
    classifier = build_zero_shot_classifier(
        model.clip_params,
        cfg.model,
        class_names,
        model.tokenizer,
        templates=templates,
        raw_names=args.raw_names,
    )
    log.info("zero-shot classifier: %d classes x %d templates", len(class_names), len(templates))

    domain_root = args.domain_root or os.path.dirname(cfg.data_root) or "."
    cache = PathFeatureCache(model, preprocess=preprocess)
    scale = float(np.exp(np.asarray(model.clip_params["logit_scale"])))

    results = []
    for domain in args.domains:
        index = ImageFolderIndex.scan(os.path.join(domain_root, domain))
        split = few_shot_split(index, class_names, num_shots=0, seed=cfg.train.seed)
        cached = cache.gather(split.val)
        img = cached.feats / np.linalg.norm(cached.feats, axis=-1, keepdims=True)
        logits = scale * img @ np.asarray(classifier).T
        acc = 100.0 * float((logits.argmax(-1) == cached.labels).mean())
        log.info("[Zero-Shot/%s] accuracy: %.2f%%", domain, acc)
        results.append({"Domain": domain, "Shots": "Zero-Shot", "Accuracy": acc})

    csv_path = save_results_csv(
        results, os.path.join(paths["csv_dir"], "zero_shot_results.csv")
    )
    plot_path = save_cross_domain_bar(
        results,
        os.path.join(paths["plot_dir"], "zero_shot_bar.png"),
        title="Zero-Shot Cross-Domain Accuracy",
        ylim=(0, 100),
    )
    log.info("results: %s | plot: %s", csv_path, plot_path)
    return {"results": results, "csv": csv_path, "plot": plot_path}


if __name__ == "__main__":
    main()
