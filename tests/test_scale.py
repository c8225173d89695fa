"""Scale tests: DomainNet-sized class vocabularies (BASELINE config 4).

Structural checks on CPU with the tiny tower: a 64-class prompt bank (padded
capacity), class-batched attribution at scale, dynamic growth past the
initial capacity, and stable jit cache behavior (no retrace per added class).
"""

import jax
import numpy as np
import pytest

from tapclip_tpu.config import PromptConfig
from tapclip_tpu.models.model_wrapper import FullModel, full_model_forward


@pytest.fixture(scope="module")
def many_classes():
    return [f"Class_{i:03d}" for i in range(64)]


def test_many_class_forward(tiny_cfg, tiny_params, many_classes, rng):
    model = FullModel(
        many_classes,
        tiny_params,
        tiny_cfg,
        prompt_cfg=PromptConfig(max_classes=72),
    )
    imgs = rng.standard_normal(
        (4, tiny_cfg.image_size, tiny_cfg.image_size, 3)
    ).astype(np.float32)
    out = model(imgs, np.asarray([0, 13, 63, 7]))
    assert out["logits"].shape == (4, 64)
    assert out["attribution"].shape == (64, 5)
    assert np.isfinite(float(out["loss"]))
    np.testing.assert_allclose(
        np.asarray(out["attribution"]).sum(-1), np.ones(64), rtol=1e-4
    )


def test_growth_beyond_capacity_no_retrace_within_capacity(
    tiny_cfg, tiny_params, rng
):
    model = FullModel(
        ["A", "B"],
        tiny_params,
        tiny_cfg,
        prompt_cfg=PromptConfig(max_classes=8),
    )
    imgs = rng.standard_normal(
        (2, tiny_cfg.image_size, tiny_cfg.image_size, 3)
    ).astype(np.float32)
    model(imgs)
    n_compiles_before = full_model_forward._cache_size()
    # Adding classes within capacity must NOT retrace the jitted forward.
    for name in ["C", "D", "E"]:
        model.add_class_prompt(name)
        model(imgs)
    assert full_model_forward._cache_size() == n_compiles_before
    # Growing past capacity changes the padded shape -> exactly one retrace.
    for i in range(5):
        model.add_class_prompt(f"X{i}")
    out = model(imgs)
    assert out["logits"].shape == (2, 10)
    assert full_model_forward._cache_size() == n_compiles_before + 1
