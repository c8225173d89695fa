"""CLIP-Adapter tests (tapclip_tpu/clip_adapter.py)."""

import numpy as np

from tapclip_tpu.clip_adapter import (
    adapter_accuracy,
    adapter_logits,
    apply_adapter,
    fit_clip_adapter,
    init_adapter,
    search_ratio,
)


def _sphere_blobs(rng, n_per, d, c, sep=3.0):
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


def test_init_shapes_and_determinism():
    a = init_adapter(32, reduction=4, seed=7)
    assert a["w1"].shape == (32, 8) and a["w2"].shape == (8, 32)
    b = init_adapter(32, reduction=4, seed=7)
    np.testing.assert_array_equal(a["w1"], b["w1"])
    c = init_adapter(32, reduction=4, seed=8)
    assert not np.array_equal(a["w1"], c["w1"])


def test_ratio_zero_is_pure_zero_shot():
    rng = np.random.default_rng(1)
    X, y = _sphere_blobs(rng, 8, 32, 4)
    zs = _class_means(X, y, 4)
    adapter = init_adapter(32, seed=0)
    # blend ratio 0 -> re-normalized original features (already unit norm)
    out = np.asarray(apply_adapter(adapter, X, 0.0))
    np.testing.assert_allclose(out, X, rtol=1e-5, atol=1e-5)
    base = 100.0 * X @ zs.T
    logits = np.asarray(adapter_logits(X, zs, 100.0, adapter, 0.0))
    np.testing.assert_allclose(logits, base, rtol=1e-4, atol=1e-4)


def test_apply_adapter_normalizes():
    rng = np.random.default_rng(2)
    X, _ = _sphere_blobs(rng, 8, 16, 3)
    out = np.asarray(apply_adapter(init_adapter(16, seed=1), X * 5.0, 0.5))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_adapter_rescues_permuted_classifier():
    """With a permuted (wrong-class) zero-shot classifier the frozen features
    score ~0%; the trained visual adapter must remap them onto the permuted
    class directions."""
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
    zs_bad = _class_means(Xtr, (ytr + 1) % 5, 5)
    before = adapter_accuracy(Xva, yva, zs_bad, 100.0, None, 0.0)
    visual, text = fit_clip_adapter(
        Xtr, ytr, zs_bad, 100.0, ratio=0.5, steps=400, lr=1e-2
    )
    assert text is None
    after = adapter_accuracy(Xva, yva, zs_bad, 100.0, visual, 0.5)
    assert before <= 0.3
    assert after >= 0.9


def test_fit_seed_determinism():
    rng = np.random.default_rng(4)
    X, y = _sphere_blobs(rng, 6, 16, 3)
    zs = _class_means(X, y, 3)
    v1, _ = fit_clip_adapter(X, y, zs, 100.0, steps=20, seed=5)
    v2, _ = fit_clip_adapter(X, y, zs, 100.0, steps=20, seed=5)
    np.testing.assert_array_equal(v1["w1"], v2["w1"])
    np.testing.assert_array_equal(v1["w2"], v2["w2"])


def test_joint_text_adapter_trains():
    rng = np.random.default_rng(5)
    X, y = _sphere_blobs(rng, 12, 24, 4)
    zs = _class_means(X, y, 4)
    visual, text = fit_clip_adapter(
        X, y, zs, 100.0, ratio=0.2, text_adapter=True, steps=50
    )
    assert text is not None
    assert text["w1"].shape == (24, 6)
    # joint logits evaluate and stay sane on the training data
    acc = adapter_accuracy(X, y, zs, 100.0, visual, 0.2, text)
    assert acc >= 0.9
    # the text adapter actually moved from init
    assert not np.array_equal(text["w1"], init_adapter(24, seed=1)["w1"])


def test_search_ratio_returns_grid_argmax():
    rng = np.random.default_rng(6)
    X, y = _sphere_blobs(rng, 10, 16, 3)
    zs = _class_means(X, y, 3)
    visual, _ = fit_clip_adapter(X, y, zs, 100.0, ratio=0.3, steps=50)
    ratios = (0.0, 0.3, 0.7)
    r, acc = search_ratio(X, y, zs, 100.0, visual, ratios=ratios)
    assert r in ratios
    direct = adapter_accuracy(X, y, zs, 100.0, visual, r)
    assert abs(acc - direct) < 1e-6
    for rr in ratios:
        assert acc >= adapter_accuracy(X, y, zs, 100.0, visual, rr) - 1e-6


def test_cli_end_to_end(tmp_path):
    """CLI drive on a color-separable synthetic ImageFolder (tiny tower)."""
    from PIL import Image

    from tapclip_tpu.clip_adapter import main
    from tapclip_tpu.config import TINY_TEST

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
                "--ratio", "0.5", "--steps", "300", "--lr", "1e-2",
                "--search-ratio"])
    # random-weight zero-shot is ~chance (1/3); the adapter carries the signal
    assert res["adapter_acc"] >= res["zero_shot_acc"]
    assert res["adapter_acc"] >= 0.9
