"""Model soups: average fine-tuned CLIP checkpoints (Wortsman et al. 2022).

Averaging the weights of multiple fine-tuned models improves accuracy and
robustness without inference cost — the standard post-training recipe for
CLIP fine-tunes (the sweep driver's per-seed cells are natural ingredients).

Two recipes:
* **uniform** — plain mean of all ingredient trees;
* **greedy** — ingredients sorted by held-out zero-shot accuracy, each added
  to the soup only if it does not hurt that accuracy (needs --val-root).

Ingredients are Orbax trees (pretrain_cli output) or open_clip ``.bin``;
the soup is written as an Orbax tree loadable via ``--pretrained``
everywhere (export back to ``.bin`` with scripts/convert_checkpoint.py).

Usage:
    python scripts/model_soup.py --inputs runs/a/models/clip_pretrained \\
        runs/b/models/clip_pretrained --out soup/
    python scripts/model_soup.py --inputs ... --greedy \\
        --val-root data/OfficeHome/Art --model ViT-B-32 --out soup/
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

log = logging.getLogger("tapclip_tpu.soup")


def average_trees(trees):
    """Uniform soup: leaf-wise f32 mean, cast back to each leaf's dtype."""
    import jax

    if not trees:
        raise ValueError("no ingredient trees")
    ref = jax.tree.structure(trees[0])
    for i, t in enumerate(trees[1:], 1):
        if jax.tree.structure(t) != ref:
            raise ValueError(f"ingredient {i} has a different tree structure")

    def mean(*leaves):
        a = np.mean([np.asarray(l, np.float64) for l in leaves], axis=0)
        return a.astype(np.asarray(leaves[0]).dtype)

    return jax.tree.map(mean, *trees)


def _zeroshot_acc(params, cfg, index, loader, tokenizer, encode_fn, logits_fn):
    import jax

    from tapclip_tpu.zero_shot import (
        build_zero_shot_classifier,
        evaluate_zero_shot,
    )

    params = jax.tree.map(lambda a: a, params)  # ensure on-device copies ok
    clf = build_zero_shot_classifier(
        params, cfg, index.classes, tokenizer, encode_fn=encode_fn
    )
    return evaluate_zero_shot(params, cfg, clf, iter(loader),
                              logits_fn=logits_fn)


def greedy_soup(trees, accs_sorted_idx, eval_fn):
    """Wortsman et al.'s greedy recipe: ingredients in descending held-out
    accuracy; keep each only if the running soup's accuracy doesn't drop."""
    soup = [trees[accs_sorted_idx[0]]]
    best = eval_fn(average_trees(soup))
    kept = [int(accs_sorted_idx[0])]
    for i in accs_sorted_idx[1:]:
        cand = eval_fn(average_trees(soup + [trees[i]]))
        if cand >= best:
            soup.append(trees[i])
            kept.append(int(i))
            best = cand
            log.info("  + ingredient %d kept (val %.2f%%)", i, cand)
        else:
            log.info("  - ingredient %d dropped (val %.2f%% < %.2f%%)",
                     i, cand, best)
    return average_trees(soup), kept, best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--inputs", nargs="+", required=True,
                   help="ingredient checkpoints (Orbax dirs or .bin)")
    p.add_argument("--out", required=True, help="output Orbax dir")
    p.add_argument("--greedy", action="store_true",
                   help="greedy soup (needs --val-root)")
    p.add_argument("--val-root", default=None,
                   help="labeled ImageFolder for the greedy recipe's "
                        "held-out zero-shot accuracy")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None, help="'tiny' for tests")
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--platform", default=None, help="e.g. cpu (tests)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from tapclip_tpu.train import setup_platform

    setup_platform(args.platform)

    import jax
    import orbax.checkpoint as ocp

    from tapclip_tpu.config import MODEL_PRESETS, preset
    from tapclip_tpu.featurize import load_clip_params

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    if len(args.inputs) < 2:
        raise SystemExit("a soup needs at least 2 ingredients")
    trees = [load_clip_params(cfg, path) for path in args.inputs]
    log.info("soup: %d ingredients (%s)", len(trees), cfg.name)

    kept = list(range(len(trees)))
    val_acc = None
    if args.greedy:
        if not args.val_root:
            raise SystemExit("--greedy needs --val-root")
        from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader
        from tapclip_tpu.data.tokenizer import get_tokenizer
        from tapclip_tpu.models import clip as clip_model
        from tapclip_tpu.zero_shot import zero_shot_logits

        index = ImageFolderIndex.scan(args.val_root)
        loader = Loader(index.samples, args.batch_size, shuffle=False,
                        image_size=cfg.image_size)
        tokenizer = get_tokenizer(args.bpe_path, cfg.context_length)
        encode_fn = jax.jit(lambda pr, i: clip_model.encode_text(pr, cfg, i))
        logits_fn = jax.jit(lambda pr, c, x: zero_shot_logits(pr, cfg, c, x))

        def eval_fn(tree):
            return _zeroshot_acc(tree, cfg, index, loader, tokenizer,
                                 encode_fn, logits_fn)

        accs = [eval_fn(t) for t in trees]
        order = list(np.argsort(accs)[::-1])
        log.info("ingredient accuracies: %s",
                 [f"{a:.2f}%" for a in accs])
        soup, kept, val_acc = greedy_soup(trees, order, eval_fn)
    else:
        soup = average_trees(trees)

    out = os.path.abspath(args.out)
    ocp.PyTreeCheckpointer().save(
        out, jax.tree.map(np.asarray, soup), force=True
    )
    msg = f"soup saved: {out} ({len(kept)}/{len(trees)} ingredients"
    if val_acc is not None:
        msg += f", val {val_acc:.2f}%"
    log.info(msg + ")")
    return {"out": out, "kept": kept, "val_acc": val_acc}


if __name__ == "__main__":
    main()
