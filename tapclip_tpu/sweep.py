"""Hyperparameter sweep driver: a grid of prompt-tuning runs, one tower pass.

The reference's experiments are hand-edited config blocks rerun by hand
(``/root/reference/train.py:29-39`` — version string, lr, shots all
hardcoded; ``test_cross_domain2.py`` is itself a manual (shots x domain)
grid).  This driver runs the whole study in one process the TPU-shaped way:

- the frozen image tower runs ONCE per distinct image
  (``trainer.PathFeatureCache``) — every grid cell reuses the cached
  features, so a 24-cell sweep costs ~24 prompt-tuning loops on cached
  [N, E] features plus a single tower pass over the union of splits;
- each cell gets a fresh, seeded ``FullModel`` (independent trainable
  init), the same early-stopping loop as ``train.py``;
- artifacts: ``sweep.csv`` (one row per cell, all axes + best accuracy +
  epochs) and ``best.json`` (retrain the winning cell with ``train.py`` to
  produce a deployable checkpoint).

Usage:
    python -m tapclip_tpu.sweep --data-root data/.../Real\\ World \\
        --classes Backpack Pen Mug --out sweeps/ \\
        --lrs 2e-3 5e-3 --shots 5 15 --adjustors scale gate --seeds 0 1
"""

from __future__ import annotations

import csv
import dataclasses
import itertools
import json
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

log = logging.getLogger("tapclip_tpu")


def run_sweep(
    clip_params,
    clip_cfg,
    *,
    data_root: str,
    class_names: Sequence[str],
    base_prompt_cfg,
    base_train_cfg,
    tokenizer=None,
    lrs: Sequence[float] = (2e-3,),
    shots: Sequence[int] = (5,),
    adjustors: Sequence[str] = ("scale",),
    prompt_lens: Sequence[int] = (5,),
    seeds: Sequence[int] = (0,),
    epochs: Optional[int] = None,
    verbose: bool = False,
) -> List[Dict]:
    """Run the grid; returns one result row per cell (best-acc sorted last
    column untouched — rows come back in grid order)."""
    import jax

    from tapclip_tpu.data.imagefolder import ImageFolderIndex, few_shot_split
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.trainer import PathFeatureCache, fit_prompt_model

    # Validate the grid BEFORE any training: a bad axis value must not
    # throw away hours of completed cells mid-grid.
    bad_shots = [n for n in shots if n <= 0]
    if bad_shots:
        raise ValueError(
            f"shots={bad_shots}: zero-shot cells don't belong in a tuning "
            "sweep (every cell trains; use zero_shot_eval for 0-shot rows)"
        )
    index = ImageFolderIndex.scan(data_root)
    # One tower pass for the whole sweep: the cache is keyed by image path
    # and the tower is frozen, so every (lr, shots, adjustor, prompt_len,
    # seed) cell gathers from the same feature store.
    probe = FullModel(
        list(class_names), clip_params, clip_cfg,
        prompt_cfg=base_prompt_cfg, tokenizer=tokenizer,
    )
    cache = PathFeatureCache(probe)

    rows: List[Dict] = []
    grid = list(itertools.product(lrs, shots, adjustors, prompt_lens, seeds))
    log.info("sweep: %d cells over %d classes (%s)", len(grid),
             len(class_names), data_root)
    for ci, (lr, n_shots, adjustor, p_len, seed) in enumerate(grid):
        pcfg = dataclasses.replace(
            base_prompt_cfg, adjustor_method=adjustor, prompt_len=p_len
        )
        tcfg = dataclasses.replace(
            base_train_cfg, lr=lr, num_shots=n_shots, seed=seed
        )
        model = FullModel(
            list(class_names), clip_params, clip_cfg, prompt_cfg=pcfg,
            tokenizer=tokenizer, rng=jax.random.PRNGKey(seed),
        )
        split = few_shot_split(index, list(class_names), n_shots, seed=seed)
        t0 = time.perf_counter()
        result = fit_prompt_model(
            model,
            cache.gather(split.train),
            cache.gather(split.val),
            tcfg,
            epochs=epochs,
            verbose=verbose,
        )
        row = {
            "lr": lr,
            "shots": n_shots,
            "adjustor": adjustor,
            "prompt_len": p_len,
            "seed": seed,
            "best_acc": round(result.best_acc, 4),
            "epochs_run": result.epochs_run,
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        rows.append(row)
        log.info("[%d/%d] %s", ci + 1, len(grid), row)
    return rows


def write_artifacts(rows: List[Dict], out_dir: str) -> Dict:
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "sweep.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    best = max(rows, key=lambda r: r["best_acc"])
    with open(os.path.join(out_dir, "best.json"), "w") as f:
        json.dump(best, f, indent=2)
    return {"csv": csv_path, "best": best, "n_cells": len(rows)}


def main(argv: Optional[List[str]] = None) -> Dict:
    import argparse

    from tapclip_tpu.config import MODEL_PRESETS, preset

    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--data-root", required=True)
    p.add_argument("--classes", nargs="+", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="ViT-B-16", choices=sorted(MODEL_PRESETS))
    p.add_argument("--preset", default=None,
                   help="experiment preset ('tiny' for tests); overrides "
                        "--model")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--lrs", type=float, nargs="+", default=[2e-3])
    p.add_argument("--shots", type=int, nargs="+", default=[5])
    p.add_argument("--adjustors", nargs="+", default=["scale"],
                   choices=["scale", "gate", "residual"])
    p.add_argument("--prompt-lens", type=int, nargs="+", default=[5])
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--platform", default=None, help="e.g. cpu (tests)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from tapclip_tpu.train import setup_platform

    setup_platform(args.platform)

    if args.preset:
        ecfg = preset(args.preset)
    else:
        from tapclip_tpu.config import ExperimentConfig

        ecfg = ExperimentConfig(model=MODEL_PRESETS[args.model])
    if args.pretrained:
        ecfg = dataclasses.replace(ecfg, pretrained_path=args.pretrained)
    classes = args.classes or list(ecfg.class_names)

    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.featurize import load_clip_params

    params = load_clip_params(ecfg.model, ecfg.pretrained_path)
    tokenizer = get_tokenizer(args.bpe_path, ecfg.model.context_length)

    rows = run_sweep(
        params,
        ecfg.model,
        data_root=args.data_root,
        class_names=classes,
        base_prompt_cfg=ecfg.prompt,
        base_train_cfg=ecfg.train,
        tokenizer=tokenizer,
        lrs=args.lrs,
        shots=args.shots,
        adjustors=args.adjustors,
        prompt_lens=args.prompt_lens,
        seeds=args.seeds,
        epochs=args.epochs,
    )
    out = write_artifacts(rows, args.out)
    log.info("sweep complete: %d cells -> %s (best: %s)", out["n_cells"],
             out["csv"], out["best"])
    return out


if __name__ == "__main__":
    main()
