"""Linear-probe evaluation: multinomial logistic regression on frozen
CLIP features.

The third leg of the standard CLIP evaluation protocol (zero-shot /
linear-probe / fine-tune — the original CLIP paper evaluates all its
representation claims with L-BFGS linear probes).  The reference covers
only the prompt-tuning axis; this closes the representation-quality
readout so pretrained/distilled/EMA checkpoints can be compared the way
the literature compares them.

TPU-shaped: features are extracted once through the frozen tower
(``featurize``-style, one padded executable), then the probe trains
FULL-BATCH inside ONE jitted ``lax.fori_loop`` — a [N, D] x [D, C] GEMM
per iteration on the MXU, zero per-step host round trips (the tunnel
costs ~125 ms per readback; L-BFGS-quality convergence comes from running
a few hundred cheap full-batch Adam steps instead).

Usage:
    python -m tapclip_tpu.linear_probe --train-root data/.../Real_World \\
        --val-root data/.../Clipart --model ViT-B-16 --pretrained ckpt/
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")


def fit_linear_probe(
    features: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    *,
    steps: int = 500,
    lr: float = 0.1,
    weight_decay: float = 1e-4,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train ``softmax(features @ W + b)`` full-batch -> ``(W [D,C], b [C])``.

    Cross-entropy + L2 on W (sklearn's ``LogisticRegression(C=...)``
    convention, as the CLIP paper uses), cosine-decayed Adam, every step
    inside one jitted ``fori_loop`` (a single device dispatch).
    """
    import jax
    import jax.numpy as jnp
    import optax

    X = jnp.asarray(features, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)
    D = X.shape[1]
    opt = optax.adam(
        optax.cosine_decay_schedule(lr, steps)
    )

    def loss_fn(wb):
        W, b = wb
        logits = X @ W + b
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return ce + weight_decay * jnp.sum(W * W)

    @jax.jit
    def fit(key):
        W0 = 0.01 * jax.random.normal(key, (D, num_classes), jnp.float32)
        wb0 = (W0, jnp.zeros((num_classes,), jnp.float32))

        def body(_, carry):
            wb, opt_state = carry
            grads = jax.grad(loss_fn)(wb)
            updates, opt_state = opt.update(grads, opt_state, wb)
            return optax.apply_updates(wb, updates), opt_state

        (W, b), _ = jax.lax.fori_loop(
            0, steps, body, (wb0, opt.init(wb0))
        )
        return W, b

    W, b = fit(jax.random.PRNGKey(seed))
    return np.asarray(W), np.asarray(b)


def probe_accuracy(
    features: np.ndarray, labels: np.ndarray, W: np.ndarray, b: np.ndarray
) -> float:
    pred = np.argmax(features.astype(np.float32) @ W + b, axis=-1)
    return float((pred == np.asarray(labels)).mean())


def _extract(cfg, params, root: str, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Frozen-tower features + labels for an ImageFolder tree."""
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader
    from tapclip_tpu.featurize import featurize_images, make_image_embed_fn

    index = ImageFolderIndex.scan(root)
    loader = Loader(index.samples, batch_size, shuffle=False,
                    image_size=cfg.image_size, output_dtype="uint8")
    feats = featurize_images(
        params, cfg, iter(loader), embed_fn=make_image_embed_fn(cfg)
    )
    labels = np.asarray([l for _, l in index.samples], np.int32)
    return feats.astype(np.float32), labels


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--train-root", required=True, help="ImageFolder (train)")
    p.add_argument("--val-root", default=None,
                   help="ImageFolder (eval; default: train accuracy only)")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    from tapclip_tpu.config import MODEL_PRESETS, preset
    from tapclip_tpu.featurize import load_clip_params

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    params = load_clip_params(cfg, args.pretrained)

    Xtr, ytr = _extract(cfg, params, args.train_root, args.batch_size)
    n_cls = int(ytr.max()) + 1
    log.info("probe: %d train features (%d classes, dim %d)",
             len(ytr), n_cls, Xtr.shape[1])
    W, b = fit_linear_probe(
        Xtr, ytr, n_cls, steps=args.steps, lr=args.lr,
        weight_decay=args.weight_decay,
    )
    result = {"train_acc": probe_accuracy(Xtr, ytr, W, b)}
    log.info("linear-probe train accuracy: %.2f%%", 100 * result["train_acc"])
    if args.val_root:
        Xva, yva = _extract(cfg, params, args.val_root, args.batch_size)
        result["val_acc"] = probe_accuracy(Xva, yva, W, b)
        log.info("linear-probe val accuracy: %.2f%%", 100 * result["val_acc"])
    return result


if __name__ == "__main__":
    main()
