"""CLIP-Adapter: residual bottleneck adapters on frozen CLIP features.

CLIP-Adapter (Gao et al., 2021) fine-tunes a tiny bottleneck MLP on top of
the frozen tower output and blends it residually into the original feature:

    a(f)  = relu(relu(f @ W1) @ W2)          (D -> D/r -> D, bias-free)
    f'    = ratio * a(f) + (1 - ratio) * f   (then re-L2-normalized)

trained with cross-entropy on few-shot logits against the frozen zero-shot
text classifier.  The paper's best variant adapts the visual side only; a
text-side adapter (same shape, applied to the class text features) is
available as the joint variant.  This is the third axis of few-shot
adaptation next to prompt tuning (the reference's only axis,
``/root/reference/train.py``) and the Tip-Adapter cache model
(``tapclip_tpu/tip_adapter.py``).

TPU-shaped like ``tip_adapter``: towers are frozen, so everything after the
one-time feature extraction is GEMMs on ``[N_shots, D]`` matrices.  Training
is full-batch inside one jitted ``lax.fori_loop`` — a single device
dispatch — and the ratio grid search evaluates every cell in one vmapped
dispatch from the shared adapted features.

Usage:
    python -m tapclip_tpu.clip_adapter --train-root .../Real_World \\
        --shots 16 --model ViT-B-16 --pretrained ckpt/ --ratio 0.2
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")

Adapter = Dict[str, np.ndarray]


def init_adapter(dim: int, reduction: int = 4, seed: int = 0) -> Adapter:
    """Bias-free bottleneck ``{"w1": [D, D//r], "w2": [D//r, D]}``.

    He-style init (relu fan-in scaling) so the residual branch starts
    small-but-alive; the blend ratio keeps early training near the
    zero-shot solution.
    """
    hidden = max(1, dim // reduction)
    rng = np.random.default_rng(seed)
    return {
        "w1": (rng.standard_normal((dim, hidden)) * np.sqrt(2.0 / dim)).astype(
            np.float32
        ),
        "w2": (
            rng.standard_normal((hidden, dim)) * np.sqrt(2.0 / hidden)
        ).astype(np.float32),
    }


def apply_adapter(adapter, feats, ratio: float):
    """Residual-blend ``feats`` through the adapter -> re-normalized [N, D]."""
    import jax.numpy as jnp

    f = jnp.asarray(feats, jnp.float32)
    a = jnp.maximum(jnp.maximum(f @ jnp.asarray(adapter["w1"]), 0.0)
                    @ jnp.asarray(adapter["w2"]), 0.0)
    out = ratio * a + (1.0 - ratio) * f
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def adapter_logits(
    img_feats,
    zs_classifier,
    logit_scale: float,
    visual: Optional[Adapter],
    ratio: float,
    text: Optional[Adapter] = None,
    text_ratio: Optional[float] = None,
):
    """``[B, C]`` logits with the visual (and optionally text) adapter applied."""
    import jax.numpy as jnp

    q = jnp.asarray(img_feats, jnp.float32)
    t = jnp.asarray(zs_classifier, jnp.float32)
    if visual is not None:
        q = apply_adapter(visual, q, ratio)
    if text is not None:
        t = apply_adapter(text, t, ratio if text_ratio is None else text_ratio)
    return logit_scale * q @ t.T


def fit_clip_adapter(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    *,
    ratio: float = 0.2,
    reduction: int = 4,
    text_adapter: bool = False,
    steps: int = 200,
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
    seed: int = 0,
) -> Tuple[Adapter, Optional[Adapter]]:
    """Train the adapter(s) with CE on few-shot features -> ``(visual, text)``.

    Towers, features, and the zero-shot classifier stay frozen; only the
    bottleneck weights train (AdamW + cosine decay).  Few-shot sets are tiny
    (N = shots x classes), so the whole optimization runs full-batch inside
    one jitted ``fori_loop``.
    """
    import jax
    import jax.numpy as jnp
    import optax

    X = jnp.asarray(train_feats, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    T = jnp.asarray(zs_classifier, jnp.float32)
    dim = int(X.shape[-1])
    params = {"visual": init_adapter(dim, reduction, seed)}
    if text_adapter:
        params["text"] = init_adapter(int(T.shape[-1]), reduction, seed + 1)
    params = jax.tree.map(jnp.asarray, params)
    opt = optax.adamw(
        optax.cosine_decay_schedule(lr, steps), weight_decay=weight_decay
    )

    def loss_fn(p):
        logits = adapter_logits(
            X, T, logit_scale, p["visual"], ratio, p.get("text")
        )
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def fit(p0):
        def body(_, carry):
            p, opt_state = carry
            grads = jax.grad(loss_fn)(p)
            updates, opt_state = opt.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        p, _ = jax.lax.fori_loop(0, steps, body, (p0, opt.init(p0)))
        return p

    trained = jax.tree.map(np.asarray, fit(params))
    return trained["visual"], trained.get("text")


def search_ratio(
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    visual: Adapter,
    ratios: Sequence[float] = (0.1, 0.2, 0.35, 0.5, 0.65, 0.8),
    text: Optional[Adapter] = None,
) -> Tuple[float, float]:
    """Grid-search the blend ratio on held-out features -> ``(ratio, acc)``.

    One vmapped dispatch: the adapter MLP outputs are shared across cells,
    each cell only re-blends and re-scores.
    """
    import jax
    import jax.numpy as jnp

    y = jnp.asarray(val_labels, jnp.int32)
    grid = jnp.asarray(ratios, jnp.float32)

    @jax.jit
    def grid_acc(grid):
        def cell(r):
            logits = adapter_logits(
                val_feats, zs_classifier, logit_scale, visual, r, text, r
            )
            return jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))

        return jax.vmap(cell)(grid)

    accs = np.asarray(grid_acc(grid))
    best = int(np.argmax(accs))
    return float(ratios[best]), float(accs[best])


def adapter_accuracy(
    feats: np.ndarray,
    labels: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    visual: Optional[Adapter],
    ratio: float,
    text: Optional[Adapter] = None,
) -> float:
    logits = np.asarray(
        adapter_logits(feats, zs_classifier, logit_scale, visual, ratio, text)
    )
    return float((logits.argmax(-1) == np.asarray(labels)).mean())


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--train-root", required=True, help="ImageFolder (few-shot source)")
    p.add_argument("--val-root", default=None,
                   help="ImageFolder for eval (default: held-out split of train-root)")
    p.add_argument("--shots", type=int, default=16)
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--ratio", type=float, default=0.2,
                   help="residual blend weight of the adapter branch")
    p.add_argument("--reduction", type=int, default=4,
                   help="bottleneck reduction factor (hidden = D // reduction)")
    p.add_argument("--text-adapter", action="store_true",
                   help="also train a text-side adapter (joint variant)")
    p.add_argument("--search-ratio", action="store_true",
                   help="grid-search the blend ratio on the eval features")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-2)
    p.add_argument("--ensemble", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    from tapclip_tpu.config import MODEL_PRESETS, preset
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, few_shot_split
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.featurize import load_clip_params
    from tapclip_tpu.tip_adapter import _extract_split
    from tapclip_tpu.zero_shot import (
        DEFAULT_TEMPLATES,
        OPENAI_IMAGENET_TEMPLATES_SMALL,
        build_zero_shot_classifier,
    )

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    params = load_clip_params(cfg, args.pretrained)
    logit_scale = float(np.exp(np.asarray(params["logit_scale"], np.float32)))

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

    zs_classifier = np.asarray(
        build_zero_shot_classifier(
            params, cfg, class_names, get_tokenizer(args.bpe_path),
            templates=(OPENAI_IMAGENET_TEMPLATES_SMALL if args.ensemble
                       else DEFAULT_TEMPLATES),
        )
    )
    Xtr, ytr = _extract_split(cfg, params, split.train, args.batch_size)
    Xva, yva = _extract_split(cfg, params, val_samples, args.batch_size)
    log.info("clip-adapter: %d shots x %d classes, %d eval samples",
             args.shots, len(class_names), len(yva))

    result = {
        "zero_shot_acc": adapter_accuracy(
            Xva, yva, zs_classifier, logit_scale, None, 0.0
        )
    }
    visual, text = fit_clip_adapter(
        Xtr, ytr, zs_classifier, logit_scale,
        ratio=args.ratio, reduction=args.reduction,
        text_adapter=args.text_adapter, steps=args.steps, lr=args.lr,
        weight_decay=args.weight_decay, seed=args.seed,
    )
    ratio = args.ratio
    if args.search_ratio:
        ratio, _ = search_ratio(
            Xva, yva, zs_classifier, logit_scale, visual, text=text
        )
        log.info("clip-adapter: grid-searched ratio=%.2f", ratio)
    result.update(
        ratio=ratio,
        adapter_acc=adapter_accuracy(
            Xva, yva, zs_classifier, logit_scale, visual, ratio, text
        ),
    )
    for k, v in result.items():
        log.info("clip-adapter %s: %s", k,
                 f"{100 * v:.2f}%" if k.endswith("acc") else v)
    return result


if __name__ == "__main__":
    main()
