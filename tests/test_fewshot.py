"""Unified few-shot benchmark tests (tapclip_tpu/fewshot.py)."""

import numpy as np
import pytest

from tapclip_tpu.config import TINY_TEST


@pytest.fixture(scope="module")
def color_folder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("fewshot_data") / "train"
    rng = np.random.default_rng(0)
    colors = {"Blue": (30, 30, 200), "Green": (30, 200, 30), "Red": (200, 30, 30)}
    for name, c in colors.items():
        d = root / name
        d.mkdir(parents=True)
        for i in range(10):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 20, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


def test_knn_classify_oracle():
    """Weighted k-NN matches a numpy recomputation and solves blobs."""
    from tapclip_tpu.fewshot import knn_classify

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((4, 16)) * 4.0

    def draw(n_per):
        X = np.concatenate(
            [centers[i] + rng.standard_normal((n_per, 16)) for i in range(4)]
        ).astype(np.float32)
        X /= np.linalg.norm(X, axis=-1, keepdims=True)
        return X, np.repeat(np.arange(4), n_per).astype(np.int32)

    Xtr, ytr = draw(8)
    Xva, yva = draw(8)
    scores = np.asarray(knn_classify(Xtr, ytr, Xva, 4, k=5, temperature=0.1))
    assert scores.shape == (32, 4)
    assert (scores.argmax(-1) == yva).mean() >= 0.9
    # numpy oracle for one query
    sims = Xva[0] @ Xtr.T
    top = np.argsort(-sims)[:5]
    expect = np.zeros(4)
    for i in top:
        expect[ytr[i]] += np.exp(sims[i] / 0.1)
    np.testing.assert_allclose(scores[0], expect, rtol=1e-4)
    # k larger than the train set clamps instead of failing
    s2 = np.asarray(knn_classify(Xtr, ytr, Xva, 4, k=999))
    assert s2.shape == (32, 4)


def test_unknown_method_rejected(color_folder):
    from tapclip_tpu.fewshot import run_fewshot_benchmark

    with pytest.raises(ValueError, match="unknown methods"):
        run_fewshot_benchmark(color_folder, methods=("frobnicate",),
                              cfg=TINY_TEST, params=None)


def test_all_methods_end_to_end(color_folder, tmp_path):
    """Every method runs on the color-separable task through the CLI; the
    feature-space learners must hit >=90% (random-weight tiny towers still
    make color linearly separable); artifacts land on disk."""
    from tapclip_tpu.fewshot import main

    results = main([
        "--train-root", color_folder, "--shots", "5", "--preset", "tiny",
        "--batch-size", "16", "--epochs", "25", "--lr", "5e-2",
        "--maple-depth", "2", "--out", str(tmp_path / "art"), "--seed", "0",
    ])
    by_method = {r["Method"]: r for r in results}
    assert set(by_method) == {
        "zero-shot", "knn", "linear-probe", "tip-adapter", "tip-adapter-f",
        "clip-adapter", "prompt", "prograd", "promptsrc", "maple", "tpt",
    }
    # tpt is test-time-only (anchored at zero-shot quality) so it is NOT in
    # the signal-carrying >=90% group below — random tiny towers give it no
    # trained signal to amplify; its range/schema assertions still apply.
    for r in results:
        assert r["Shots"] == "5-shot"
        assert 0.0 <= r["Accuracy"] <= 100.0
        assert r["TrainSeconds"] >= 0.0
    # the signal-carrying learners must solve the separable task
    assert by_method["knn"]["Accuracy"] >= 90.0
    assert by_method["linear-probe"]["Accuracy"] >= 90.0
    assert by_method["tip-adapter"]["Accuracy"] >= 90.0
    assert by_method["prompt"]["Accuracy"] >= 90.0
    # prograd/promptsrc constrain updates toward the zero-shot predictions;
    # on a random-weight tiny tower the zero-shot prior is uninformative, so
    # they carry signal but may sit below unconstrained prompt tuning.
    assert by_method["prograd"]["Accuracy"] >= 80.0
    assert by_method["promptsrc"]["Accuracy"] >= 80.0
    assert by_method["maple"]["Accuracy"] >= 90.0
    assert (tmp_path / "art" / "fewshot.csv").exists()
    assert (tmp_path / "art" / "fewshot_bar.png").exists()
    header = (tmp_path / "art" / "fewshot.csv").read_text().splitlines()[0]
    assert header.split(",")[:4] == ["Method", "Shots", "Accuracy", "TrainSeconds"]


def test_method_subset(color_folder):
    """A subset run touches only the requested methods and skips the
    feature pass when only maple is requested."""
    import jax

    from tapclip_tpu.fewshot import run_fewshot_benchmark
    from tapclip_tpu.models.clip import init_clip_params

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    results = run_fewshot_benchmark(
        color_folder, shots=4, methods=("zero-shot", "tip-adapter"),
        cfg=TINY_TEST, params=params, batch_size=16, verbose=False,
    )
    assert [r["Method"] for r in results] == ["zero-shot", "tip-adapter"]


def test_tpt_method(color_folder):
    """The test-time row runs without any cached-feature pass and scores
    a plausible accuracy on the separable folder."""
    import jax

    from tapclip_tpu.fewshot import run_fewshot_benchmark
    from tapclip_tpu.models.clip import init_clip_params

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    results = run_fewshot_benchmark(
        color_folder, shots=2, methods=("tpt",),
        cfg=TINY_TEST, params=params, batch_size=16, tpt_views=3,
        verbose=False,
    )
    assert [r["Method"] for r in results] == ["tpt"]
    assert 0.0 <= results[0]["Accuracy"] <= 100.0
