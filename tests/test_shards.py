"""Webdataset tar-shard streaming loader tests (tapclip_tpu/data/shards.py)."""

import io
import os

import numpy as np
import pytest

from tapclip_tpu.data.shards import (
    ShardLoader,
    count_samples,
    list_shards,
    write_shards,
)


def _jpeg(rng, size=32):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    samples = [(_jpeg(rng), f"caption number {i}") for i in range(22)]
    paths = write_shards(samples, str(root), shard_size=5)
    assert len(paths) == 5  # 5+5+5+5+2
    return str(root)


def _tok(caps):
    # toy "tokenizer": the caption's trailing integer, shaped [B, 4]
    ids = np.asarray([int(c.rsplit(" ", 1)[1]) for c in caps], np.int32)
    return np.tile(ids[:, None], (1, 4))


def test_count_and_len(shard_dir):
    shards = list_shards(shard_dir)
    assert count_samples(shards) == 22
    loader = ShardLoader(shards, 4, tokenize=_tok, image_size=32,
                         shuffle_buffer=8)
    assert loader.num_samples == 22
    assert len(loader) == 5


def test_one_epoch_sees_every_sample_once(shard_dir):
    loader = ShardLoader(list_shards(shard_dir), 4, tokenize=_tok,
                         image_size=32, shuffle_buffer=8, seed=1)
    seen = []
    for images, ids in loader:
        assert images.shape == (4, 32, 32, 3)
        assert images.dtype == np.float32
        assert ids.shape == (4, 4)
        seen.extend(ids[:, 0].tolist())
    # 5 full batches of 4 = 20 of 22; no duplicates
    assert len(seen) == 20
    assert len(set(seen)) == 20


def test_deterministic_and_epoch_varying(shard_dir):
    def first_epoch_ids(seed):
        loader = ShardLoader(list_shards(shard_dir), 4, tokenize=_tok,
                             image_size=32, shuffle_buffer=8, seed=seed)
        return [tuple(ids[:, 0]) for _, ids in loader]

    assert first_epoch_ids(3) == first_epoch_ids(3)

    loader = ShardLoader(list_shards(shard_dir), 4, tokenize=_tok,
                         image_size=32, shuffle_buffer=8, seed=3)
    e0 = [tuple(ids[:, 0]) for _, ids in loader]
    e1 = [tuple(ids[:, 0]) for _, ids in loader]
    assert e0 != e1  # per-epoch reshuffle


def test_rank_world_partition(shard_dir):
    shards = list_shards(shard_dir)
    ids0, ids1 = set(), set()
    for rank, acc in ((0, ids0), (1, ids1)):
        loader = ShardLoader(shards, 2, tokenize=_tok, image_size=32,
                             shuffle_buffer=4, rank=rank, world=2)
        for _, ids in loader:
            acc.update(ids[:, 0].tolist())
    assert ids0 and ids1
    assert not (ids0 & ids1)  # disjoint shard subsets


def test_resume_at_shard_granularity(shard_dir):
    shards = list_shards(shard_dir)
    kw = dict(tokenize=_tok, image_size=32, shuffle_buffer=1, seed=5)
    # full pass for reference
    ref = ShardLoader(shards, 2, **kw)
    full = [tuple(ids[:, 0]) for _, ids in ref]

    loader = ShardLoader(shards, 2, **kw)
    it = iter(loader)
    got = [tuple(next(it)[1][:, 0]) for _ in range(3)]
    assert len(got) == 3 and len(full) >= 3
    state = loader.state()
    assert state["epoch"] == 0 and state["shards_done"] >= 1

    fresh = ShardLoader(shards, 2, **kw)
    fresh.restore(state)
    resumed = [tuple(ids[:, 0]) for _, ids in fresh]
    done = state["shards_done"]
    resumed_ids = {i for b in resumed for i in b}
    # resumed ids must come only from NOT-yet-completed shards
    rng = np.random.default_rng(np.random.SeedSequence([5, 0]))
    order = rng.permutation(len(shards))
    from tapclip_tpu.data.shards import _iter_shard

    allowed = set()
    for pos in range(done, len(order)):
        for _, cap in _iter_shard(shards[int(order[pos])]):
            allowed.add(int(cap.rsplit(" ", 1)[1]))
    assert resumed_ids <= allowed
    assert resumed_ids  # and it actually produced data


def test_missing_dir_and_bad_rank(tmp_path):
    with pytest.raises(FileNotFoundError):
        list_shards(str(tmp_path))
    with pytest.raises(ValueError):
        ShardLoader(["x.tar"], 2, tokenize=_tok, rank=2, world=2)


def test_corrupt_member_skipped(tmp_path):
    """A corrupt tar member is skipped (warned + counted), not fatal."""
    rng = np.random.default_rng(5)
    samples = [(_jpeg(rng), f"caption number {i}") for i in range(9)]
    samples[4] = (b"garbage bytes", samples[4][1])
    write_shards(samples, str(tmp_path), shard_size=9)
    loader = ShardLoader(
        list_shards(str(tmp_path)), 4, tokenize=_tok, image_size=32,
        shuffle_buffer=1, seed=0,
    )
    batches = list(loader)
    seen = {int(i) for _, t in batches for i in t[:, 0]}
    assert 4 not in seen and len(seen) == 8
    assert loader.skipped == 1


def test_native_decode_matches_pil_loader(tmp_path):
    """ShardLoader batches are identical whichever decoder runs (the C++
    bytes path is PIL-bit-exact and preserves eviction order)."""
    from tapclip_tpu.data import native

    if not native.available():
        pytest.skip(f"native pipeline unavailable: {native.build_error()}")
    rng = np.random.default_rng(7)
    samples = [(_jpeg(rng), f"caption number {i}") for i in range(14)]
    write_shards(samples, str(tmp_path), shard_size=7)

    def batches(use_native):
        loader = ShardLoader(
            list_shards(str(tmp_path)), 4, tokenize=_tok, image_size=32,
            shuffle_buffer=3, seed=0, use_native=use_native,
        )
        return list(loader)

    a, b = batches(False), batches(True)
    assert len(a) == len(b) == 3
    for (ia, ta), (ib, tb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)


def test_uint8_output_mode(shard_dir):
    """uint8 batches == rint(f32*255) of the float mode, same order."""
    from tapclip_tpu.data.shards import ShardLoader, list_shards

    kw = dict(tokenize=_tok, image_size=32, shuffle_buffer=4, seed=3)
    f32 = list(ShardLoader(list_shards(shard_dir), 4, **kw))
    u8 = list(ShardLoader(list_shards(shard_dir), 4,
                          output_dtype="uint8", **kw))
    assert len(f32) == len(u8) and len(f32) > 0
    for (fi, ft), (ui, ut) in zip(f32, u8):
        assert ui.dtype == np.uint8
        np.testing.assert_array_equal(ft, ut)
        # float mode is CLIP-normalized; uint8 mode normalizes on device
        from tapclip_tpu.data.preprocess import device_normalize

        np.testing.assert_allclose(
            np.asarray(device_normalize(ui)), fi, atol=1e-6
        )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="output_dtype"):
        ShardLoader(list_shards(shard_dir), 4, output_dtype="f16", **kw)
