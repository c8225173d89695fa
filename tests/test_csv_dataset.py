"""CSV (path, caption) pretraining data-path tests (data/csv_dataset.py)."""

import os

import numpy as np
import pytest

from tapclip_tpu.data.csv_dataset import CsvLoader


def _tok(caps):
    ids = np.asarray([int(c.rsplit(" ", 1)[1]) for c in caps], np.int32)
    return np.tile(ids[:, None], (1, 4))


@pytest.fixture(scope="module")
def csv_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("csvdata")
    (root / "imgs").mkdir()
    rng = np.random.default_rng(0)
    rows = ["filepath\ttitle"]
    for i in range(11):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i}.jpg")
        rows.append(f"imgs/{i}.jpg\tcaption number {i}")
    (root / "train.tsv").write_text("\n".join(rows) + "\n")
    return str(root)


def test_batches_shapes_and_coverage(csv_root):
    loader = CsvLoader(os.path.join(csv_root, "train.tsv"), 4,
                       tokenize=_tok, image_size=32)
    assert loader.num_samples == 11 and len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2  # full batches only (tail of 3 dropped)
    for imgs, ids in batches:
        assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.float32
        assert ids.shape == (4, 4) and ids.dtype == np.int32
    seen = {int(i) for _, ids in batches for i in ids[:, 0]}
    assert len(seen) == 8  # 8 distinct samples, no duplicates


def test_epoch_reshuffle_and_restore(csv_root):
    path = os.path.join(csv_root, "train.tsv")
    a = CsvLoader(path, 4, tokenize=_tok, image_size=32, seed=3)
    e0 = [ids[:, 0].tolist() for _, ids in a]
    e1 = [ids[:, 0].tolist() for _, ids in a]
    assert e0 != e1  # per-epoch reshuffle
    b = CsvLoader(path, 4, tokenize=_tok, image_size=32, seed=3)
    b.restore({"epoch": 1})
    assert [ids[:, 0].tolist() for _, ids in b] == e1  # epoch-aligned resume


def test_rank_partitioning(csv_root):
    path = os.path.join(csv_root, "train.tsv")
    r0 = CsvLoader(path, 2, tokenize=_tok, image_size=32, rank=0, world=2)
    r1 = CsvLoader(path, 2, tokenize=_tok, image_size=32, rank=1, world=2)
    s0 = {p for p, _ in r0.samples}
    s1 = {p for p, _ in r1.samples}
    assert not (s0 & s1) and len(s0) + len(s1) == 11


def test_validation_errors(csv_root, tmp_path):
    path = os.path.join(csv_root, "train.tsv")
    with pytest.raises(ValueError, match="need columns"):
        CsvLoader(path, 2, tokenize=_tok, img_key="nope")
    empty = tmp_path / "empty.tsv"
    empty.write_text("filepath\ttitle\n")
    with pytest.raises(ValueError, match="no data rows"):
        CsvLoader(str(empty), 2, tokenize=_tok)
    with pytest.raises(ValueError, match="bad rank"):
        CsvLoader(path, 2, tokenize=_tok, rank=2, world=2)


def test_cli_csv_pretraining(csv_root, tmp_path):
    """End-to-end: two epochs of tiny pretraining from the TSV manifest."""
    import jax

    from tapclip_tpu.pretrain_cli import main

    out = main(["--preset", "tiny", "--csv-path",
                os.path.join(csv_root, "train.tsv"),
                "--epochs", "2", "--batch-size", "8",
                "--output-root", str(tmp_path)])
    assert len(out["loss_history"]) == 2
    assert all(np.isfinite(v) for v in out["loss_history"])
    assert os.path.isdir(out["ckpt"])


def test_corrupt_image_skipped(csv_root, tmp_path):
    """A corrupt file is skipped with a warning; later samples backfill the
    batch (full-batch contract holds) and the run does not crash."""
    import shutil

    root = tmp_path / "corrupt"
    shutil.copytree(csv_root, root)
    (root / "imgs" / "3.jpg").write_bytes(b"not a jpeg at all")
    loader = CsvLoader(str(root / "train.tsv"), 4, tokenize=_tok,
                       image_size=32, seed=0)
    batches = list(loader)
    ids = {int(i) for _, t in batches for i in t[:, 0]}
    assert 3 not in ids
    assert loader.skipped == 1
    assert all(imgs.shape[0] == 4 for imgs, _ in batches)
    assert sum(imgs.shape[0] for imgs, _ in batches) == 8  # 10 good // 4 * 4


def test_native_decode_matches_pil_loader(csv_root):
    from tapclip_tpu.data import native

    if not native.available():
        pytest.skip(f"native pipeline unavailable: {native.build_error()}")
    path = os.path.join(csv_root, "train.tsv")
    a = list(CsvLoader(path, 4, tokenize=_tok, image_size=32, seed=1,
                       use_native=False))
    b = list(CsvLoader(path, 4, tokenize=_tok, image_size=32, seed=1,
                       use_native=True))
    assert len(a) == len(b) == 2
    for (ia, ta), (ib, tb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)
