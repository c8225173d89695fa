"""Tip-Adapter: training-free few-shot adaptation via a cache model.

Tip-Adapter (Zhang et al., ECCV 2022) builds a key/value cache from the
few-shot training features — keys are the L2-normalized image embeddings,
values their one-hot labels — and blends a kernel-weighted cache readout
into the zero-shot logits:

    logits = logit_scale * q @ W_zs.T            (zero-shot CLIP)
           + alpha * exp(-beta * (1 - q @ keys.T)) @ values

Tip-Adapter-F additionally fine-tunes the keys (a single linear layer)
with cross-entropy on the same few shots, typically beating prompt tuning
at a fraction of the cost.  The reference covers only the prompt-tuning
axis of few-shot adaptation (``/root/reference/train.py``,
``/root/reference/test_cross_domain2.py``); this adds the cache-model
axis over the same frozen towers and the same ``few_shot_split``
semantics.

TPU-shaped: everything after feature extraction is a handful of GEMMs on
[N_shots, D] matrices.  The alpha/beta grid search evaluates the whole
grid on device from ONE precomputed affinity matrix (no per-cell
dispatches), and Tip-Adapter-F runs all its training steps inside one
jitted ``lax.fori_loop`` — a single device dispatch, like
``linear_probe.fit_linear_probe``.

Usage:
    python -m tapclip_tpu.tip_adapter --train-root .../Real_World \\
        --shots 16 --model ViT-B-16 --pretrained ckpt/ --search-hp --finetune
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")


def build_cache_model(
    features: np.ndarray, labels: np.ndarray, num_classes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Few-shot features/labels -> ``(keys [N,D] L2-normalized, values [N,C])``."""
    keys = np.asarray(features, np.float32)
    keys = keys / np.maximum(np.linalg.norm(keys, axis=-1, keepdims=True), 1e-12)
    values = np.eye(num_classes, dtype=np.float32)[np.asarray(labels, np.int64)]
    return keys, values


def tip_logits(
    img_feats,
    keys,
    values,
    zs_classifier,
    logit_scale: float,
    alpha: float,
    beta: float,
):
    """``[B, C]`` blended logits (all inputs L2-normalized on the feature dim)."""
    import jax.numpy as jnp

    q = jnp.asarray(img_feats, jnp.float32)
    clip_logits = logit_scale * q @ jnp.asarray(zs_classifier, jnp.float32).T
    affinity = q @ jnp.asarray(keys, jnp.float32).T
    cache_logits = jnp.exp(-beta * (1.0 - affinity)) @ jnp.asarray(values, jnp.float32)
    return clip_logits + alpha * cache_logits


def search_hyperparams(
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    keys: np.ndarray,
    values: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    alphas: Sequence[float] = (0.5, 1.0, 1.75, 2.5, 3.5, 5.0),
    betas: Sequence[float] = (1.0, 2.5, 4.0, 5.5, 7.0, 8.5),
) -> Tuple[float, float, float]:
    """Grid-search ``(alpha, beta)`` on held-out features -> best triple.

    The affinity matrix and zero-shot logits are computed once; the whole
    grid is then evaluated in a single vmapped dispatch (grid cells only
    rescale/re-exponentiate the shared [B, N] affinity).
    Returns ``(alpha, beta, val_accuracy)``.
    """
    import jax
    import jax.numpy as jnp

    q = jnp.asarray(val_feats, jnp.float32)
    y = jnp.asarray(val_labels, jnp.int32)
    V = jnp.asarray(values, jnp.float32)
    clip_logits = logit_scale * q @ jnp.asarray(zs_classifier, jnp.float32).T
    affinity = q @ jnp.asarray(keys, jnp.float32).T  # [B, N]

    grid = jnp.asarray(
        [(a, b) for a in alphas for b in betas], jnp.float32
    )  # [G, 2]

    @jax.jit
    def grid_acc(grid):
        def cell(ab):
            a, b = ab[0], ab[1]
            logits = clip_logits + a * (jnp.exp(-b * (1.0 - affinity)) @ V)
            return jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))

        return jax.vmap(cell)(grid)

    accs = np.asarray(grid_acc(grid))
    best = int(np.argmax(accs))
    a, b = (float(x) for x in np.asarray(grid)[best])
    return a, b, float(accs[best])


def fit_tip_adapter_f(
    keys: np.ndarray,
    values: np.ndarray,
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    alpha: float,
    beta: float,
    *,
    steps: int = 200,
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
) -> np.ndarray:
    """Tip-Adapter-F: fine-tune the cache keys with CE -> new keys [N, D].

    The keys act as the weight of a bias-free linear layer (paper §3.2);
    values, the zero-shot classifier, and the towers stay frozen.  Few-shot
    sets are tiny (N = shots x classes), so training is full-batch inside
    one jitted ``fori_loop`` (single dispatch, MXU-sized GEMMs).
    """
    import jax
    import jax.numpy as jnp
    import optax

    X = jnp.asarray(train_feats, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    V = jnp.asarray(values, jnp.float32)
    clip_logits = logit_scale * X @ jnp.asarray(zs_classifier, jnp.float32).T
    opt = optax.adamw(
        optax.cosine_decay_schedule(lr, steps), weight_decay=weight_decay
    )

    def loss_fn(K):
        logits = clip_logits + alpha * (jnp.exp(-beta * (1.0 - X @ K.T)) @ V)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def fit(K0):
        def body(_, carry):
            K, opt_state = carry
            grads = jax.grad(loss_fn)(K)
            updates, opt_state = opt.update(grads, opt_state, K)
            return optax.apply_updates(K, updates), opt_state

        K, _ = jax.lax.fori_loop(0, steps, body, (K0, opt.init(K0)))
        return K

    return np.asarray(fit(jnp.asarray(keys, jnp.float32)))


def cache_accuracy(
    feats: np.ndarray,
    labels: np.ndarray,
    keys: np.ndarray,
    values: np.ndarray,
    zs_classifier: np.ndarray,
    logit_scale: float,
    alpha: float,
    beta: float,
) -> float:
    logits = np.asarray(
        tip_logits(feats, keys, values, zs_classifier, logit_scale, alpha, beta)
    )
    return float((logits.argmax(-1) == np.asarray(labels)).mean())


def _extract_split(cfg, params, samples, batch_size: int):
    """L2-normalized features + labels for a list of (path, label) samples."""
    from tapclip_tpu.data.imagefolder import Loader
    from tapclip_tpu.featurize import featurize_images, make_image_embed_fn

    loader = Loader(samples, batch_size, shuffle=False,
                    image_size=cfg.image_size, output_dtype="uint8")
    feats = featurize_images(
        params, cfg, iter(loader), embed_fn=make_image_embed_fn(cfg)
    )
    labels = np.asarray([l for _, l in samples], np.int32)
    return feats.astype(np.float32), labels


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
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=5.5)
    p.add_argument("--search-hp", action="store_true",
                   help="grid-search alpha/beta on the eval features")
    p.add_argument("--finetune", action="store_true",
                   help="Tip-Adapter-F: fine-tune the cache keys")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
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
    log.info("tip-adapter: %d shots x %d classes, %d eval samples",
             args.shots, len(class_names), len(yva))

    keys, values = build_cache_model(Xtr, ytr, len(class_names))
    result = {
        "zero_shot_acc": cache_accuracy(
            Xva, yva, keys, values, zs_classifier, logit_scale, 0.0, 1.0
        )
    }
    alpha, beta = args.alpha, args.beta
    if args.search_hp:
        alpha, beta, _ = search_hyperparams(
            Xva, yva, keys, values, zs_classifier, logit_scale
        )
        log.info("tip-adapter: grid-searched alpha=%.2f beta=%.2f", alpha, beta)
    result.update(
        alpha=alpha, beta=beta,
        tip_acc=cache_accuracy(
            Xva, yva, keys, values, zs_classifier, logit_scale, alpha, beta
        ),
    )
    if args.finetune:
        keys_f = fit_tip_adapter_f(
            keys, values, Xtr, ytr, zs_classifier, logit_scale, alpha, beta,
            steps=args.steps, lr=args.lr,
        )
        result["tip_f_acc"] = cache_accuracy(
            Xva, yva, keys_f, values, zs_classifier, logit_scale, alpha, beta
        )
    for k, v in result.items():
        log.info("tip-adapter %s: %s", k,
                 f"{100 * v:.2f}%" if k.endswith("acc") else v)
    return result


if __name__ == "__main__":
    main()
