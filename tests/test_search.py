"""Similarity-search tests (tapclip_tpu/search.py)."""

import numpy as np
import pytest

from tapclip_tpu.search import SearchIndex, _pow2_pad, main


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    emb = _unit(rng, 37, 16)
    manifest = [[str(i), f"item_{i}", "cls"] for i in range(37)]
    return emb, manifest


def test_pow2_pad():
    assert [_pow2_pad(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 16]


def test_self_query_top1(corpus):
    emb, manifest = corpus
    idx = SearchIndex(emb, manifest)
    scores, rows = idx.search(emb[:5], k=1)
    # each row's nearest neighbour is itself (bf16 index: scores ~1)
    np.testing.assert_array_equal(rows[:, 0], np.arange(5))
    assert scores.min() > 0.98


def test_matches_numpy_exact(corpus):
    emb, manifest = corpus
    idx = SearchIndex(emb, manifest)
    rng = np.random.default_rng(1)
    q = _unit(rng, 3, 16)
    _, rows = idx.search(q, k=4)
    # bf16 scoring can swap near-ties; compare against bf16-truncated numpy
    ref = q.astype(np.float32) @ emb.astype(np.float32).T
    for b in range(3):
        ref_top = set(np.argsort(-ref[b])[:6])
        assert set(rows[b]).issubset(ref_top)


def test_k_clamped_and_query_padding(corpus):
    emb, manifest = corpus
    idx = SearchIndex(emb, manifest)
    scores, rows = idx.search(emb[0], k=1000)  # 1-row query, k > N
    assert rows.shape == (1, 37)
    # three-row query pads to 4 internally; output stays 3
    scores, rows = idx.search(emb[:3], k=2)
    assert rows.shape == (3, 2)


def test_validation_errors(corpus):
    emb, manifest = corpus
    with pytest.raises(ValueError, match="manifest rows"):
        SearchIndex(emb, manifest[:-1])
    idx = SearchIndex(emb, manifest)
    with pytest.raises(ValueError, match="query dim"):
        idx.search(np.zeros((1, 8), np.float32))


def test_cli_row_and_text(tmp_path, corpus):
    import csv
    import jax

    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.featurize import load_clip_params, make_image_embed_fn

    # Build a real tiny-model index so --text query dims match.
    params = load_clip_params(TINY_TEST, None)
    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (6, TINY_TEST.image_size, TINY_TEST.image_size, 3))
    emb = np.asarray(make_image_embed_fn(TINY_TEST)(params, images),
                     np.float16)
    np.save(tmp_path / "image_embeddings.npy", emb)
    with open(tmp_path / "manifest.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(("index", "path", "class"))
        w.writerows((i, f"img_{i}.jpg", "c") for i in range(6))

    res = main(["--index", str(tmp_path), "--row", "2", "-k", "3"])
    assert res[0]["row"] == 2 and res[0]["score"] > 0.98
    assert len(res) == 3 and res[0]["meta"][1] == "img_2.jpg"

    res = main(["--index", str(tmp_path), "--text", "a photo",
                "-k", "2", "--preset", "tiny"])
    assert len(res) == 2 and all(-1.01 <= r["score"] <= 1.01 for r in res)


def test_text_corpus_queryable(tmp_path, tiny_cfg, tiny_params):
    """featurize --embed-text output is searchable via --corpus text
    (text->text retrieval: a caption query finds its own embedding)."""
    import io

    import jax
    from PIL import Image

    from tapclip_tpu.data.shards import write_shards
    from tapclip_tpu.featurize import main as feat_main
    from tapclip_tpu.search import main as search_main

    rng = np.random.default_rng(0)

    def jpeg():
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    shard_root = str(tmp_path / "shards")
    # short: the byte-fallback tokenizer truncates at the tiny
    # context_length, so the distinguishing char must fit
    caps = [f"obj {i}" for i in range(6)]
    write_shards([(jpeg(), c) for c in caps], shard_root, shard_size=3)
    out = str(tmp_path / "feats")
    feat_main(["--shard-dir", shard_root, "--out", out, "--preset", "tiny",
               "--batch-size", "4", "--embed-text", "--platform", "cpu"])

    results = search_main([
        "--index", out, "--corpus", "text", "--text", caps[3], "-k", "1",
        "--preset", "tiny", "--platform", "cpu",
    ])
    assert results[0]["meta"][-1] == caps[3]  # self-retrieval top-1

def test_find_duplicates_exact_pairs(corpus):
    emb, manifest = corpus
    emb = emb.copy()
    emb[20] = emb[3]                   # exact duplicate pair (3, 20)
    emb[30] = 0.8 * emb[7] + 0.2 * emb[8]  # near-duplicate of 7 (cos ~0.97)
    emb[30] /= np.linalg.norm(emb[30])
    idx = SearchIndex(emb, manifest)
    pairs = idx.find_duplicates(0.95)
    keys = {(i, j) for i, j, _ in pairs}
    assert (3, 20) in keys
    assert (7, 30) in keys
    # ordering invariants: i < j, descending score, no self pairs
    for i, j, s in pairs:
        assert i < j
        assert s >= 0.95
    scores = [s for _, _, s in pairs]
    assert scores == sorted(scores, reverse=True)
    # a tighter threshold keeps only the exact duplicate
    top = idx.find_duplicates(0.99)
    assert {(i, j) for i, j, _ in top} == {(3, 20)}


def test_find_duplicates_chunked_matches_single(corpus):
    emb, manifest = corpus
    emb = emb.copy()
    emb[35] = emb[1]
    idx = SearchIndex(emb, manifest)
    one = idx.find_duplicates(0.9, chunk=idx.n)
    many = idx.find_duplicates(0.9, chunk=8)
    assert {(i, j) for i, j, _ in one} == {(i, j) for i, j, _ in many}


def test_cli_dedup(tmp_path, corpus):
    import csv

    emb, manifest = corpus
    emb = emb.copy().astype(np.float16)
    emb[10] = emb[4]
    np.save(tmp_path / "image_embeddings.npy", emb)
    with open(tmp_path / "manifest.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(("index", "path", "class"))
        w.writerows((r[0], f"img_{r[0]}.jpg", "c") for r in manifest)

    out_csv = tmp_path / "dups.csv"
    res = main(["--index", str(tmp_path), "--dedup", "0.99",
                "--dedup-out", str(out_csv)])
    assert any(r["row_a"] == 4 and r["row_b"] == 10 for r in res)
    assert all(r["path_a"].startswith("img_") for r in res)
    lines = out_csv.read_text().splitlines()
    assert lines[0] == "row_a,path_a,row_b,path_b,score"
    assert len(lines) == 1 + len(res)

    with pytest.raises(SystemExit, match="exactly one"):
        main(["--index", str(tmp_path), "--dedup", "0.9", "--row", "1"])
