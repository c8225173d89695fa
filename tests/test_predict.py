"""Batch predict CLI: unlabeled-folder classification.

Pins that the corpus driver's cached-text-feature classify math equals the
full model forward (``FullModel.__call__``) and that the CSV/JSON artifacts
are well-formed, corrupt files are skipped, and nested dirs are covered.
"""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

from tapclip_tpu import predict as P


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory, rng_module):
    root = tmp_path_factory.mktemp("imgs")
    (root / "nested").mkdir()
    paths = []
    for i, rel in enumerate(
        ["a.jpg", "b.png", "nested/c.jpeg", "nested/d.jpg", "e.jpg"]
    ):
        arr = rng_module.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        p = root / rel
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    (root / "notes.txt").write_text("not an image")
    (root / "corrupt.jpg").write_bytes(b"\xff\xd8\xff definitely not a jpeg")
    return str(root)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def test_list_images_recursive_sorted(image_dir):
    paths = P.list_images(image_dir)
    # 5 good + 1 corrupt (listing is extension-based; decode skips later)
    assert len(paths) == 6
    assert paths == sorted(paths)
    assert not any(p.endswith(".txt") for p in paths)


def test_cli_end_to_end(image_dir, tmp_path):
    out = str(tmp_path / "preds")
    result = P.main([
        "--image-root", image_dir, "--out", out, "--preset", "tiny",
        "--batch-size", "4", "--top-k", "2", "--json",
    ])
    assert result["n"] == 5  # corrupt.jpg skipped, notes.txt never listed
    with open(result["csv"]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["path", "label", "score", "label_2", "score_2"]
    assert len(rows) == 6
    for row in rows[1:]:
        assert os.path.exists(row[0])
        s1, s2 = float(row[2]), float(row[4])
        assert 0.0 <= s2 <= s1 <= 1.0  # top-k ordered probabilities
    with open(result["json"]) as f:
        blob = json.load(f)
    assert len(blob["predictions"]) == 5
    attr = np.asarray(blob["attribution"])
    assert attr.shape[0] == len(blob["classes"])
    np.testing.assert_allclose(attr.sum(-1), 1.0, atol=1e-5)  # softmaxed


def test_matches_full_model_forward(image_dir, tiny_cfg, tiny_params):
    import jax.numpy as jnp

    from tapclip_tpu.data.preprocess import preprocess_pil
    from tapclip_tpu.models.model_wrapper import FullModel

    classes = ["Backpack", "Pen", "Mug"]
    model = FullModel(classes, tiny_params, tiny_cfg)
    paths = [p for p in P.list_images(image_dir) if "corrupt" not in p][:3]

    rows, attribution = P.predict_corpus(
        model, paths, batch_size=4, top_k=3, uint8_transfer=False
    )
    assert [r["path"] for r in rows] == paths
    assert attribution.shape[0] == len(classes)

    imgs = np.stack([
        preprocess_pil(Image.open(p).convert("RGB"), tiny_cfg.image_size)
        for p in paths
    ])
    ref = np.asarray(model(jnp.asarray(imgs))["logits"])
    # softmax over capacity: padded slots are -1e30 -> 0 probability
    ref = np.exp(ref - ref.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    for r, probs in zip(rows, ref):
        got = dict(zip(r["labels"], r["scores"]))
        for j, name in enumerate(classes):
            np.testing.assert_allclose(got[name], probs[j], atol=1e-4)


def test_uint8_transport_matches_f32(image_dir, tiny_cfg, tiny_params):
    from tapclip_tpu.models.model_wrapper import FullModel

    model = FullModel(["Backpack", "Pen"], tiny_params, tiny_cfg)
    paths = [p for p in P.list_images(image_dir) if "corrupt" not in p]
    r8, _ = P.predict_corpus(model, paths, batch_size=4, uint8_transfer=True)
    rf, _ = P.predict_corpus(model, paths, batch_size=4, uint8_transfer=False)
    for a, b in zip(r8, rf):
        assert a["labels"] == b["labels"]
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)


def test_empty_dir_rejected(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit, match="no images"):
        P.main([
            "--image-root", str(tmp_path / "empty"), "--out",
            str(tmp_path / "o"), "--preset", "tiny",
        ])


def test_image_conditioned_bypasses_text_cache(image_dir, tiny_cfg, tiny_params):
    """CoCoOp models must NOT use the cached class-feature fast path (their
    text features are per-sample); probs must equal the full forward."""
    import jax.numpy as jnp

    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.data.preprocess import preprocess_pil
    from tapclip_tpu.models.model_wrapper import FullModel

    model = FullModel(
        ["Backpack", "Pen", "Mug"], tiny_params, tiny_cfg,
        prompt_cfg=PromptConfig(max_classes=4, image_conditioned=True),
    )
    paths = [p for p in P.list_images(image_dir) if "corrupt" not in p][:3]
    rows, attribution = P.predict_corpus(
        model, paths, batch_size=4, top_k=3, uint8_transfer=False
    )
    assert attribution is None  # per-sample attribution by design

    imgs = np.stack([
        preprocess_pil(Image.open(p).convert("RGB"), tiny_cfg.image_size)
        for p in paths
    ])
    logits = np.asarray(model(jnp.asarray(imgs))["logits"])
    ref = np.exp(logits - logits.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    for r, probs in zip(rows, ref):
        got = dict(zip(r["labels"], r["scores"]))
        for j, name in enumerate(model.class_names):
            np.testing.assert_allclose(got[name], probs[j], atol=1e-4)


def test_export_classify_rejected_for_image_conditioned(tiny_cfg, tiny_params):
    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.utils import model_export as ME

    with pytest.raises(ValueError, match="image_conditioned"):
        ME.export_functions(
            tiny_params, tiny_cfg,
            PromptConfig(max_classes=4, image_conditioned=True),
            functions=("classify",),
        )


def test_saliency_overlays(image_dir, tiny_cfg, tiny_params, tmp_path):
    from tapclip_tpu.models.model_wrapper import FullModel

    model = FullModel(["Backpack", "Pen"], tiny_params, tiny_cfg)
    paths = [p for p in P.list_images(image_dir) if "corrupt" not in p][:3]
    sal_dir = str(tmp_path / "sal")
    rows, _ = P.predict_corpus(
        model, paths, batch_size=4, saliency="rollout", saliency_dir=sal_dir
    )
    assert len(rows) == 3
    for r in rows:
        assert os.path.exists(r["saliency_png"])
    assert len(os.listdir(sal_dir)) == 3
    with pytest.raises(ValueError, match="saliency"):
        P.predict_corpus(model, paths, saliency="nope", saliency_dir=sal_dir)


def test_saliency_chunking_matches_single_call(tiny_cfg, tiny_params, tmp_path):
    """>16 images exercises the chunked saliency path; grids must equal the
    one-call result (chunk boundaries must not change per-image rollout)."""
    import jax.numpy as jnp

    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.utils.saliency import patch_saliency

    rng = np.random.default_rng(7)
    paths = []
    for i in range(18):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        p = tmp_path / f"{i:02d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    model = FullModel(["Backpack", "Pen"], tiny_params, tiny_cfg)
    sal_dir = str(tmp_path / "sal")
    rows, _ = P.predict_corpus(
        model, paths, batch_size=18, saliency="last", saliency_dir=sal_dir
    )
    assert len(rows) == 18 and len(os.listdir(sal_dir)) == 18

    from tapclip_tpu.data.preprocess import preprocess_pil_uint8

    imgs = np.stack([
        preprocess_pil_uint8(Image.open(p).convert("RGB"), tiny_cfg.image_size)
        for p in paths
    ])
    ref = patch_saliency(tiny_params, tiny_cfg, jnp.asarray(imgs),
                         method="last")
    # overlay PNGs already written from chunked grids; re-derive the chunked
    # grids to compare directly
    chunked = np.concatenate([
        patch_saliency(tiny_params, tiny_cfg, jnp.asarray(imgs[s : s + 16]),
                       method="last")
        for s in range(0, 18, 16)
    ])
    np.testing.assert_allclose(chunked, ref, atol=1e-5)
