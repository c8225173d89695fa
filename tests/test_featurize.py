"""Offline bulk featurization tests (tapclip_tpu/featurize.py)."""

import csv
import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TINY_TEST
from tapclip_tpu.featurize import (
    _batched,
    featurize_images,
    featurize_texts,
    iter_shard_samples_deterministic,
    main,
    make_image_embed_fn,
    make_text_embed_fn,
)
from tapclip_tpu.models import clip as clip_model


@pytest.fixture(scope="module")
def params():
    return clip_model.init_clip_params(jax.random.PRNGKey(0), TINY_TEST)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = tmp_path_factory.mktemp("folder")
    return build_imagefolder(
        str(root), ["Backpack", "Pen", "Monitor"], per_class=3,
        image_size=TINY_TEST.image_size,
    )


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    from PIL import Image

    from tapclip_tpu.data.shards import write_shards

    root = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    samples = []
    for i in range(10):
        arr = rng.integers(0, 255, (TINY_TEST.image_size,) * 2 + (3,), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        samples.append((buf.getvalue(), f"a photo number {i}"))
    write_shards(samples, str(root), shard_size=4)
    return str(root)


def test_batched_tail_padding():
    samples = [(np.full((2, 2, 3), i, np.float32), str(i)) for i in range(5)]
    batches = list(_batched(iter(samples), 4))
    assert len(batches) == 2
    imgs, metas, mask = batches[1]
    assert imgs.shape[0] == 4 and metas == ["4"]
    assert mask.tolist() == [True, False, False, False]
    assert not imgs[1:].any()  # pad rows are zeros


def test_featurize_images_matches_direct(params, image_root):
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader

    index = ImageFolderIndex.scan(image_root)
    loader = Loader(index.samples, 4, shuffle=False,
                    image_size=TINY_TEST.image_size)
    feats = featurize_images(params, TINY_TEST, iter(loader))
    assert feats.shape == (9, TINY_TEST.embed_dim)
    assert feats.dtype == np.float16
    np.testing.assert_allclose(
        np.linalg.norm(feats.astype(np.float32), axis=-1), 1.0, atol=2e-3)
    # row 0 == direct tower call on the same preprocessed pixels
    images, _, _ = next(iter(Loader(index.samples, 4, shuffle=False,
                                    image_size=TINY_TEST.image_size)))
    direct = clip_model.l2_normalize(
        clip_model.encode_image(params, TINY_TEST, jnp.asarray(images)))
    np.testing.assert_allclose(
        feats[:4].astype(np.float32), np.asarray(direct), atol=2e-3)


def test_featurize_texts_matches_direct(params):
    from tapclip_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(None, TINY_TEST.context_length)
    caps = [f"caption {i}" for i in range(5)]
    feats = featurize_texts(params, TINY_TEST, caps, tok.tokenize, 4)
    assert feats.shape == (5, TINY_TEST.embed_dim)
    direct = clip_model.l2_normalize(
        clip_model.encode_text(params, TINY_TEST, jnp.asarray(tok.tokenize(caps))))
    np.testing.assert_allclose(
        feats.astype(np.float32), np.asarray(direct), atol=2e-3)


def test_shard_iteration_deterministic_and_complete(shard_dir):
    a = list(iter_shard_samples_deterministic(shard_dir, TINY_TEST.image_size))
    b = list(iter_shard_samples_deterministic(shard_dir, TINY_TEST.image_size))
    assert [c for _, c in a] == [f"a photo number {i}" for i in range(10)]
    assert [c for _, c in b] == [c for _, c in a]
    np.testing.assert_array_equal(a[3][0], b[3][0])


def test_dp_sharded_embed_matches_single(params):
    from tapclip_tpu.parallel.mesh import make_mesh

    images = jax.random.uniform(
        jax.random.PRNGKey(1),
        (8, TINY_TEST.image_size, TINY_TEST.image_size, 3))
    single = make_image_embed_fn(TINY_TEST)(params, images)
    sharded = make_image_embed_fn(TINY_TEST, make_mesh(dp=8))(params, images)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-5)


def test_cli_imagefolder(tmp_path, image_root):
    out = str(tmp_path / "feats")
    result = main(["--image-root", image_root, "--out", out,
                   "--preset", "tiny", "--batch-size", "4"])
    assert result == {"n": 9, "dim": TINY_TEST.embed_dim}
    feats = np.load(os.path.join(out, "image_embeddings.npy"))
    assert feats.shape == (9, TINY_TEST.embed_dim)
    with open(os.path.join(out, "manifest.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["index", "path", "class"]
    assert len(rows) == 10 and rows[1][2] == "Backpack"


def test_cli_shards_with_text(tmp_path, shard_dir):
    out = str(tmp_path / "feats")
    result = main(["--shard-dir", shard_dir, "--out", out, "--preset", "tiny",
                   "--batch-size", "4", "--embed-text"])
    assert result["n"] == 10 and result["n_text"] == 10
    tfeats = np.load(os.path.join(out, "text_embeddings.npy"))
    assert tfeats.shape == (10, TINY_TEST.embed_dim)
    with open(os.path.join(out, "manifest.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["index", "caption"]
    assert rows[2][1] == "a photo number 1"
    # caption i's embedding row == direct encode of that caption
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.featurize import load_clip_params

    params = load_clip_params(TINY_TEST, None)
    tok = get_tokenizer(None, TINY_TEST.context_length)
    direct = clip_model.l2_normalize(clip_model.encode_text(
        params, TINY_TEST, jnp.asarray(tok.tokenize(["a photo number 7"]))))
    np.testing.assert_allclose(tfeats[7].astype(np.float32),
                               np.asarray(direct)[0], atol=2e-3)


def test_uint8_transport_bit_identical(params, image_root):
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader

    index = ImageFolderIndex.scan(image_root)
    f32 = featurize_images(
        params, TINY_TEST,
        iter(Loader(index.samples, 4, shuffle=False,
                    image_size=TINY_TEST.image_size)))
    u8 = featurize_images(
        params, TINY_TEST,
        iter(Loader(index.samples, 4, shuffle=False,
                    image_size=TINY_TEST.image_size, output_dtype="uint8")))
    np.testing.assert_array_equal(f32, u8)


def test_int8_tower_featurize_close_to_f32(params, image_root):
    """--int8: quantized-tower embeddings stay unit-norm and close to f32
    (the serving-fidelity contract, cosine >= 0.99)."""
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader

    cfg8 = TINY_TEST.replace(quantize_tower=True, int8_deterministic=True)
    index = ImageFolderIndex.scan(image_root)
    mk = lambda: iter(Loader(index.samples, 4, shuffle=False,
                             image_size=TINY_TEST.image_size))
    f32 = featurize_images(params, TINY_TEST, mk()).astype(np.float32)
    i8 = featurize_images(params, cfg8, mk()).astype(np.float32)
    np.testing.assert_allclose(np.linalg.norm(i8, axis=-1), 1.0, atol=2e-3)
    cos = (f32 * i8).sum(-1)
    assert cos.min() >= 0.99, cos.min()


def test_rank_world_partition_shards(tmp_path, shard_dir_featurize=None):
    """Per-rank featurize outputs concatenated (rank order) == the world=1
    run: same rows, same embeddings, search loads them as one index."""
    import io

    from PIL import Image

    from tapclip_tpu.data.shards import write_shards
    from tapclip_tpu.featurize import main as feat_main
    from tapclip_tpu.search import SearchIndex

    rng = np.random.default_rng(0)

    def jpeg():
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    shard_root = str(tmp_path / "shards")
    write_shards([(jpeg(), f"cap {i}") for i in range(12)], shard_root,
                 shard_size=3)  # 4 shards

    common = ["--shard-dir", shard_root, "--preset", "tiny",
              "--batch-size", "4", "--platform", "cpu"]
    feat_main(common + ["--out", str(tmp_path / "all")])
    feat_main(common + ["--out", str(tmp_path / "r0"), "--rank", "0",
                        "--world", "2"])
    feat_main(common + ["--out", str(tmp_path / "r1"), "--rank", "1",
                        "--world", "2"])

    full = SearchIndex.load(str(tmp_path / "all"))
    merged = SearchIndex.load([str(tmp_path / "r0"), str(tmp_path / "r1")])
    assert merged.n == full.n == 12
    # CONTIGUOUS partition: merged == world=1 EXACTLY, row for row, so
    # recorded --row ids agree between the two forms
    assert [r[-1] for r in merged.manifest] == [r[-1] for r in full.manifest]
    np.testing.assert_allclose(
        np.asarray(merged._index, np.float32),
        np.asarray(full._index, np.float32),
        atol=1e-3,
    )


def test_rank_world_imagefolder(tmp_path, synth_root=None):
    import numpy as _np
    from PIL import Image

    from tapclip_tpu.featurize import main as feat_main

    rng = _np.random.default_rng(1)
    root = tmp_path / "imgs"
    for name in ["A", "B"]:
        (root / name).mkdir(parents=True)
        for i in range(5):
            Image.fromarray(
                rng.integers(0, 255, (36, 36, 3), dtype=_np.uint8)
            ).save(root / name / f"{i}.jpg")

    common = ["--image-root", str(root), "--preset", "tiny",
              "--batch-size", "4", "--platform", "cpu"]
    r0 = feat_main(common + ["--out", str(tmp_path / "f0"), "--rank", "0",
                             "--world", "3"])
    r1 = feat_main(common + ["--out", str(tmp_path / "f1"), "--rank", "1",
                             "--world", "3"])
    r2 = feat_main(common + ["--out", str(tmp_path / "f2"), "--rank", "2",
                             "--world", "3"])
    assert r0["n"] + r1["n"] + r2["n"] == 10
