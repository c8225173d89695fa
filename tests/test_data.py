"""Data layer tests: ImageFolder scan, seeded few-shot split, loader padding,
preprocessing golden values."""

import os

import numpy as np
import pytest

from tapclip_tpu.data.imagefolder import (
    FewShotSplit,
    ImageFolderIndex,
    Loader,
    few_shot_split,
    get_dataloaders,
)
from tapclip_tpu.data.preprocess import (
    center_crop,
    make_preprocess,
    normalize,
    preprocess_pil,
    resize_shorter_side,
)
from tapclip_tpu.data.synthetic import build_imagefolder

CLASSES = ["Backpack", "Alarm_Clock", "Laptop"]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("imgs"))
    build_imagefolder(root, CLASSES + ["Clipboards"], per_class=7, image_size=24)
    return root


class TestImageFolder:
    def test_scan(self, tree):
        idx = ImageFolderIndex.scan(tree)
        assert idx.classes == sorted(CLASSES + ["Clipboards"])
        assert len(idx.samples) == 4 * 7

    def test_scan_empty_raises(self, tmp_path):
        os.makedirs(tmp_path / "Empty")
        with pytest.raises(FileNotFoundError):
            ImageFolderIndex.scan(str(tmp_path))

    def test_relabel_in_caller_order(self, tree):
        # dataset.py:34: new labels follow caller-supplied class_names order.
        idx = ImageFolderIndex.scan(tree)
        split = few_shot_split(idx, ["Laptop", "Backpack"], num_shots=2, seed=0)
        raw_laptop = idx.class_to_idx["Laptop"]
        assert split.label_map[raw_laptop] == 0
        labels = {lb for _, lb in split.train}
        assert labels == {0, 1}

    def test_split_seeded_deterministic(self, tree):
        idx = ImageFolderIndex.scan(tree)
        a = few_shot_split(idx, CLASSES, 3, seed=42)
        b = few_shot_split(idx, CLASSES, 3, seed=42)
        c = few_shot_split(idx, CLASSES, 3, seed=43)
        assert a.train == b.train and a.val == b.val
        assert a.train != c.train

    def test_train_val_disjoint(self, tree):
        idx = ImageFolderIndex.scan(tree)
        s = few_shot_split(idx, CLASSES, 3, seed=0)
        train_paths = {p for p, _ in s.train}
        val_paths = {p for p, _ in s.val}
        assert not (train_paths & val_paths)
        assert len(s.train) == 3 * len(CLASSES)
        # val: remaining 4 per class (<=100 cap, dataset.py:57)
        assert len(s.val) == 4 * len(CLASSES)

    def test_num_shots_zero(self, tree):
        tl, vl = get_dataloaders(tree, CLASSES, num_shots=0, verbose=False,
                                 image_size=24)
        assert tl is None  # dataset.py:51-62
        assert vl.num_samples == 7 * len(CLASSES)

    def test_unknown_class_raises(self, tree):
        idx = ImageFolderIndex.scan(tree)
        with pytest.raises(KeyError):
            few_shot_split(idx, ["Nope"], 1)


class TestLoader:
    def test_padding_and_mask(self, tree):
        idx = ImageFolderIndex.scan(tree)
        s = few_shot_split(idx, CLASSES, 3, seed=0)
        loader = Loader(s.train, batch_size=4, image_size=24)  # 9 samples
        batches = list(loader)
        assert len(batches) == 3
        imgs, labels, mask = batches[-1]
        assert imgs.shape == (4, 24, 24, 3)
        assert mask.tolist() == [True, False, False, False]

    def test_shuffle_changes_order_per_epoch(self, tree):
        idx = ImageFolderIndex.scan(tree)
        s = few_shot_split(idx, CLASSES, 5, seed=0)
        loader = Loader(s.train, batch_size=15, shuffle=True, seed=1, image_size=24)
        l1 = next(iter(loader))[1].tolist()
        l2 = next(iter(loader))[1].tolist()
        assert sorted(l1) == sorted(l2)
        assert l1 != l2  # epoch-dependent permutation


class TestPreprocess:
    def test_normalize_golden(self):
        arr = np.full((2, 2, 3), 0.5, np.float32)
        out = normalize(arr)
        expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(out[0, 0], expected, rtol=1e-6)

    def test_resize_shorter_side_aspect(self):
        from PIL import Image

        img = Image.new("RGB", (100, 50))
        out = resize_shorter_side(img, 25)
        assert out.size == (50, 25)
        img2 = Image.new("RGB", (50, 100))
        assert resize_shorter_side(img2, 25).size == (25, 50)

    def test_center_crop(self):
        from PIL import Image

        arr = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
        img = Image.fromarray(arr)
        out = np.asarray(center_crop(img, 2))
        # torchvision CenterCrop: left=round((6-2)/2)=2, top=round((4-2)/2)=1
        np.testing.assert_array_equal(out, arr[1:3, 2:4])

    def test_preprocess_shape_and_range(self):
        from PIL import Image

        img = Image.fromarray(np.random.randint(0, 255, (37, 61, 3), np.uint8))
        out = preprocess_pil(img, image_size=16)
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.float32
        raw = preprocess_pil(img, image_size=16, do_normalize=False)
        assert raw.min() >= 0.0 and raw.max() <= 1.0

    def test_make_preprocess_accepts_paths(self, tree):
        fn = make_preprocess(16)
        idx = ImageFolderIndex.scan(tree)
        out = fn(idx.samples[0][0])
        assert out.shape == (16, 16, 3)


class TestUint8Transfer:
    """uint8 host->device path: bit-identical to the float pipeline."""

    def test_uint8_loader_bit_exact_through_encode(self, tree):
        import jax
        import jax.numpy as jnp

        from tapclip_tpu.config import TINY_TEST
        from tapclip_tpu.models import clip as C

        cfg = TINY_TEST
        _, vl_f32 = get_dataloaders(
            tree, CLASSES, num_shots=0, verbose=False, image_size=cfg.image_size
        )
        _, vl_u8 = get_dataloaders(
            tree, CLASSES, num_shots=0, verbose=False, image_size=cfg.image_size,
            output_dtype="uint8",
        )
        params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
        for (im_f, lb_f, mask), (im_u, lb_u, _) in zip(vl_f32, vl_u8):
            assert im_u.dtype == np.uint8
            assert (lb_f == lb_u).all()
            feats_f = np.asarray(C.encode_image(params, cfg, jnp.asarray(im_f)))
            feats_u = np.asarray(C.encode_image(params, cfg, jnp.asarray(im_u)))
            # Padding rows differ by construction (pixel-space vs
            # normalized-space zeros) and are masked downstream.
            np.testing.assert_allclose(
                feats_f[mask], feats_u[mask], rtol=1e-5, atol=1e-5
            )

    def test_uint8_device_normalize_matches_host(self, tree):
        from tapclip_tpu.data.preprocess import device_normalize

        _, vl_f32 = get_dataloaders(
            tree, CLASSES, num_shots=0, verbose=False, image_size=24
        )
        _, vl_u8 = get_dataloaders(
            tree, CLASSES, num_shots=0, verbose=False, image_size=24,
            output_dtype="uint8",
        )
        for (im_f, _, mask), (im_u, _, _) in zip(vl_f32, vl_u8):
            np.testing.assert_allclose(
                np.asarray(device_normalize(im_u))[mask], im_f[mask],
                rtol=0, atol=2e-6,
            )

    def test_uint8_rejects_custom_preprocess(self, tree):
        with pytest.raises(ValueError):
            get_dataloaders(
                tree, CLASSES, num_shots=0, verbose=False, image_size=24,
                preprocess=lambda p: p, output_dtype="uint8",
            )


def test_imagefolder_corrupt_image_skipped(tmp_path):
    """Undecodable files are masked out (python and native paths), never
    fatal: production corpora always contain a few."""
    from PIL import Image

    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader

    rng = np.random.default_rng(0)
    d = tmp_path / "ClassA"
    d.mkdir()
    for i in range(5):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.jpg")
    (d / "2.jpg").write_bytes(b"truncated garbage")

    for use_native in (False, True):
        loader = Loader(
            ImageFolderIndex.scan(str(tmp_path)).samples, 3,
            image_size=32, use_native=use_native,
        )
        total = sum(int(m.sum()) for _, _, m in loader)
        assert total == 4, f"use_native={use_native}"
        assert loader.skipped == 1, f"use_native={use_native}"
