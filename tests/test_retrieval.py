"""Retrieval Recall@K metric tests (utils/eval_metrics.retrieval_recall)."""

import numpy as np
import pytest

from tapclip_tpu.utils.eval_metrics import retrieval_recall


def test_perfectly_aligned_features():
    feats = np.eye(8, 16, dtype=np.float32)  # orthonormal, paired identically
    m = retrieval_recall(feats, feats, ks=(1, 5))
    assert m["i2t_r@1"] == 1.0 and m["t2i_r@1"] == 1.0
    assert m["i2t_r@5"] == 1.0


def test_shifted_pairs_rank_k():
    # every image's BEST text is its neighbor's (0.6) while the true pair
    # scores 0.4 -> R@1 = 0, R@2 = 1
    n = 6
    img = np.eye(n, dtype=np.float32)
    txt = 0.4 * np.eye(n) + 0.6 * np.roll(np.eye(n), 1, axis=0)
    txt = txt.astype(np.float32)
    m = retrieval_recall(img, txt, ks=(1, 2))
    assert m["i2t_r@1"] == 0.0
    assert m["i2t_r@2"] == 1.0


def test_k_larger_than_n_and_ties():
    n = 4
    feats = np.ones((n, 8), np.float32)  # all identical: full ties
    m = retrieval_recall(feats, feats, ks=(1, 10))
    # pessimistic tie handling: nothing ranks top-1 except n==1
    assert m["i2t_r@1"] == 0.0
    # K >= n always recalls everything
    assert m["i2t_r@10"] == 1.0 and m["t2i_r@10"] == 1.0


def test_unpaired_raises():
    with pytest.raises(ValueError):
        retrieval_recall(np.ones((3, 4)), np.ones((2, 4)))


def test_random_features_baseline():
    rng = np.random.default_rng(0)
    n = 200
    img = rng.standard_normal((n, 32)).astype(np.float32)
    txt = rng.standard_normal((n, 32)).astype(np.float32)
    m = retrieval_recall(img, txt, ks=(1, 10))
    # independent features: R@K ~ K/n
    assert m["i2t_r@1"] < 0.05
    assert 0.01 < m["i2t_r@10"] < 0.15
