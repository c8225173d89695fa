"""PathFeatureCache tests: encode-once semantics + gather correctness."""

import os

import numpy as np
import pytest

from tapclip_tpu.config import PromptConfig
from tapclip_tpu.data.synthetic import build_imagefolder
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.trainer import PathFeatureCache, cache_features


@pytest.fixture()
def setup(tiny_cfg, tiny_params, tiny_prompt_cfg, tmp_path):
    root = str(tmp_path)
    build_imagefolder(root, ["A", "B"], per_class=4, image_size=24)
    model = FullModel(["A", "B"], tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)
    paths = []
    for cls in ["A", "B"]:
        d = os.path.join(root, cls)
        paths += [os.path.join(d, f) for f in sorted(os.listdir(d))]
    return model, paths


def test_encode_once(setup):
    model, paths = setup
    cache = PathFeatureCache(model, batch_size=3)
    cache.ensure(paths[:5])
    assert len(cache) == 5
    feats_before = {p: cache._feats[p].copy() for p in paths[:5]}
    cache.ensure(paths)  # only the remaining 3 are new
    assert len(cache) == len(paths)
    for p, f in feats_before.items():
        np.testing.assert_array_equal(cache._feats[p], f)


def test_gather_order_and_labels(setup):
    model, paths = setup
    cache = PathFeatureCache(model, batch_size=4)
    samples = [(paths[3], 1), (paths[0], 0), (paths[5], 1)]
    cached = cache.gather(samples)
    assert cached.feats.shape == (3, model.clip_cfg.embed_dim)
    np.testing.assert_array_equal(cached.labels, [1, 0, 1])
    # row order matches sample order
    single = cache.gather([(paths[0], 0)])
    np.testing.assert_array_equal(cached.feats[1], single.feats[0])


def test_matches_loader_features(setup, tiny_cfg):
    """Path-cached features == loader-batch features for the same images."""
    from tapclip_tpu.data.imagefolder import Loader

    model, paths = setup
    samples = [(p, i % 2) for i, p in enumerate(paths)]
    cache = PathFeatureCache(model, batch_size=3)
    cached = cache.gather(samples)
    loader = Loader(samples, batch_size=4, image_size=tiny_cfg.image_size)
    via_loader = cache_features(model, loader)
    np.testing.assert_allclose(cached.feats, via_loader.feats, rtol=1e-5, atol=1e-6)
