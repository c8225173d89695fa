"""Linear-probe tests (tapclip_tpu/linear_probe.py)."""

import numpy as np
import pytest

from tapclip_tpu.linear_probe import fit_linear_probe, main, probe_accuracy


def _blobs(rng, n_per, d, c, sep=4.0):
    """Linearly separable class blobs."""
    centers = rng.standard_normal((c, d)) * sep
    X = np.concatenate(
        [centers[i] + rng.standard_normal((n_per, d)) for i in range(c)]
    ).astype(np.float32)
    y = np.repeat(np.arange(c), n_per).astype(np.int32)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def test_separable_blobs_reach_high_accuracy():
    rng = np.random.default_rng(0)
    X, y = _blobs(rng, 40, 8, 3)
    W, b = fit_linear_probe(X, y, 3, steps=300)
    assert W.shape == (8, 3) and b.shape == (3,)
    assert probe_accuracy(X, y, W, b) >= 0.99


def test_weight_decay_shrinks_weights():
    rng = np.random.default_rng(0)
    X, y = _blobs(rng, 30, 6, 2)
    W_lo, _ = fit_linear_probe(X, y, 2, steps=200, weight_decay=1e-6)
    W_hi, _ = fit_linear_probe(X, y, 2, steps=200, weight_decay=1.0)
    assert np.linalg.norm(W_hi) < np.linalg.norm(W_lo)


def test_deterministic_in_seed():
    rng = np.random.default_rng(0)
    X, y = _blobs(rng, 20, 4, 2)
    W1, b1 = fit_linear_probe(X, y, 2, steps=50, seed=3)
    W2, b2 = fit_linear_probe(X, y, 2, steps=50, seed=3)
    np.testing.assert_array_equal(W1, W2)
    np.testing.assert_array_equal(b1, b2)


def test_cli_end_to_end(tmp_path):
    """Full CLI drive on a color-separable synthetic ImageFolder: the frozen
    random tiny tower still embeds colors apart, so the probe must beat
    chance by a wide margin and reach ~100% train accuracy."""
    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.data.synthetic import build_imagefolder

    # class-colored tree (synthetic.build_imagefolder is random noise;
    # build color-separable images here)
    from PIL import Image

    rng = np.random.default_rng(0)
    colors = {"Red": (200, 30, 30), "Green": (30, 200, 30), "Blue": (30, 30, 200)}
    for split in ("train", "val"):
        for name, c in colors.items():
            d = tmp_path / split / name
            d.mkdir(parents=True)
            for i in range(8 if split == "train" else 4):
                arr = np.clip(
                    np.array(c)[None, None]
                    + rng.normal(0, 20, (TINY_TEST.image_size,) * 2 + (3,)),
                    0, 255,
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")

    res = main(["--train-root", str(tmp_path / "train"),
                "--val-root", str(tmp_path / "val"),
                "--preset", "tiny", "--batch-size", "8", "--steps", "300"])
    assert res["train_acc"] >= 0.95
    assert res["val_acc"] >= 0.75
