"""Tip-Adapter tests (tapclip_tpu/tip_adapter.py)."""

import numpy as np
import pytest

from tapclip_tpu.tip_adapter import (
    build_cache_model,
    cache_accuracy,
    fit_tip_adapter_f,
    search_hyperparams,
    tip_logits,
)


def _sphere_blobs(rng, n_per, d, c, sep=3.0):
    """L2-normalized class blobs (cosine-separable, like CLIP features)."""
    centers = rng.standard_normal((c, d)) * sep
    X = np.concatenate(
        [centers[i] + rng.standard_normal((n_per, d)) for i in range(c)]
    ).astype(np.float32)
    X = X / np.linalg.norm(X, axis=-1, keepdims=True)
    y = np.repeat(np.arange(c), n_per).astype(np.int32)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def _class_means(X, y, c):
    M = np.stack([X[y == i].mean(0) for i in range(c)])
    return (M / np.linalg.norm(M, axis=-1, keepdims=True)).astype(np.float32)


def test_cache_model_shapes_and_normalization():
    rng = np.random.default_rng(0)
    X, y = _sphere_blobs(rng, 4, 16, 3)
    keys, values = build_cache_model(X * 7.0, y, 3)  # unnormalized input OK
    assert keys.shape == (12, 16) and values.shape == (12, 3)
    np.testing.assert_allclose(np.linalg.norm(keys, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(values.sum(-1), np.ones(12))
    np.testing.assert_array_equal(values.argmax(-1), y)


def test_alpha_zero_is_pure_zero_shot():
    rng = np.random.default_rng(1)
    X, y = _sphere_blobs(rng, 8, 32, 4)
    keys, values = build_cache_model(X, y, 4)
    zs = _class_means(X, y, 4)
    base = 100.0 * np.asarray(X @ zs.T)
    out = np.asarray(tip_logits(X, keys, values, zs, 100.0, 0.0, 5.5))
    np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-4)


def test_cache_improves_over_weak_zero_shot():
    """With a deliberately bad zero-shot classifier, the cache readout must
    recover most of the accuracy (the few-shot keys carry the signal)."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((5, 32)) * 3.0
    def draw(n_per):
        X = np.concatenate(
            [centers[i] + rng.standard_normal((n_per, 32)) for i in range(5)]
        ).astype(np.float32)
        X /= np.linalg.norm(X, axis=-1, keepdims=True)
        return X, np.repeat(np.arange(5), n_per).astype(np.int32)
    Xtr, ytr = draw(16)
    Xva, yva = draw(16)
    zs_bad = _class_means(Xtr, (ytr + 1) % 5, 5)  # permuted -> ~0% zero-shot
    keys, values = build_cache_model(Xtr, ytr, 5)
    zs_acc = cache_accuracy(Xva, yva, keys, values, zs_bad, 100.0, 0.0, 5.5)
    tip_acc = cache_accuracy(Xva, yva, keys, values, zs_bad, 100.0, 20.0, 5.5)
    assert zs_acc <= 0.3
    assert tip_acc >= 0.9


def test_search_hyperparams_returns_grid_argmax():
    rng = np.random.default_rng(4)
    X, y = _sphere_blobs(rng, 12, 16, 3)
    keys, values = build_cache_model(X, y, 3)
    zs = _class_means(X, y, 3)
    alphas, betas = (0.0, 2.0), (1.0, 5.0)
    a, b, acc = search_hyperparams(
        X, y, keys, values, zs, 100.0, alphas=alphas, betas=betas
    )
    assert a in alphas and b in betas
    # reported accuracy matches a direct recomputation at (a, b)
    direct = cache_accuracy(X, y, keys, values, zs, 100.0, a, b)
    assert abs(acc - direct) < 1e-6
    # and is >= every other grid cell
    for aa in alphas:
        for bb in betas:
            assert acc >= cache_accuracy(X, y, keys, values, zs, 100.0, aa, bb) - 1e-6


def test_finetune_improves_noisy_cache():
    """Replace every key row with noise; Tip-Adapter-F must relearn the
    keys from the few shots (values pin each key to its class)."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 24)) * 2.0
    def draw(n_per):
        X = np.concatenate(
            [centers[i] + rng.standard_normal((n_per, 24)) for i in range(4)]
        ).astype(np.float32)
        X /= np.linalg.norm(X, axis=-1, keepdims=True)
        return X, np.repeat(np.arange(4), n_per).astype(np.int32)
    Xtr, ytr = draw(8)
    Xva, yva = draw(16)
    keys, values = build_cache_model(Xtr, ytr, 4)
    noisy = rng.standard_normal(keys.shape).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)
    zs_bad = np.zeros((4, 24), np.float32)  # no zero-shot signal at all
    before = cache_accuracy(Xva, yva, noisy, values, zs_bad, 100.0, 5.0, 5.5)
    keys_f = fit_tip_adapter_f(
        noisy, values, Xtr, ytr, zs_bad, 100.0, 5.0, 5.5, steps=300, lr=1e-2
    )
    after = cache_accuracy(Xva, yva, keys_f, values, zs_bad, 100.0, 5.0, 5.5)
    assert before <= 0.6
    assert after > before
    assert after >= 0.85


def test_cli_end_to_end(tmp_path):
    """CLI drive on a color-separable synthetic ImageFolder (tiny tower):
    the cache model must push accuracy well above the random-text zero-shot."""
    from PIL import Image

    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.tip_adapter import main

    rng = np.random.default_rng(0)
    colors = {"Blue": (30, 30, 200), "Green": (30, 200, 30), "Red": (200, 30, 30)}
    for name, c in colors.items():
        d = tmp_path / "train" / name
        d.mkdir(parents=True)
        for i in range(12):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 20, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    res = main(["--train-root", str(tmp_path / "train"), "--shots", "4",
                "--preset", "tiny", "--batch-size", "8",
                "--alpha", "10.0", "--search-hp", "--finetune",
                "--steps", "100"])
    # random-weight zero-shot is ~chance (1/3); the cache carries the signal
    assert res["tip_acc"] >= res["zero_shot_acc"]
    assert res["tip_acc"] >= 0.9
    assert res["tip_f_acc"] >= 0.8
    assert res["alpha"] > 0.0
