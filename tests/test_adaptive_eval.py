"""Input-aware two-path eval (PIVOT-style; utils/adaptive_eval.py)."""

import numpy as np
import pytest

from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.utils.adaptive_eval import adaptive_logits, evaluate_adaptive

CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    # prune after layer 1 of the 2-layer tiny tower so the cheap path differs
    return FullModel(CLASSES, tiny_params,
                     tiny_cfg.replace(token_prune_layer=1),
                     prompt_cfg=tiny_prompt_cfg)


@pytest.fixture()
def imgs(tiny_cfg, rng):
    return rng.standard_normal(
        (8, tiny_cfg.image_size, tiny_cfg.image_size, 3)
    ).astype(np.float32)


def test_margin_inf_equals_full_path(model, imgs):
    """With an infinite margin every sample is rescued -> exactly the full
    tower's logits."""
    logits, stats = adaptive_logits(model, imgs, margin=np.inf)
    assert stats["n_rescued"] == len(imgs)
    full = np.asarray(model(imgs)["logits"], np.float32)
    np.testing.assert_allclose(logits[:, : model.n_cls], full, rtol=1e-4,
                               atol=1e-4)


def test_margin_zero_equals_cheap_path(model, imgs, tiny_cfg):
    logits, stats = adaptive_logits(model, imgs, margin=0.0)
    assert stats["n_rescued"] == 0
    cheap_model = FullModel(
        CLASSES, model.clip_params,
        tiny_cfg.replace(token_prune_layer=1, token_keep_ratio=0.5),
        prompt_cfg=model.prompt_cfg,
    )
    cheap_model.trainable = model.trainable
    cheap = np.asarray(cheap_model(imgs)["logits"], np.float32)
    np.testing.assert_allclose(logits[:, : model.n_cls], cheap, rtol=1e-4,
                               atol=1e-4)


def test_partial_rescue_mixes_paths(model, imgs):
    """A mid threshold rescues some-but-not-all samples; rescued rows carry
    full-path logits, the rest cheap-path logits."""
    base, _ = adaptive_logits(model, imgs, margin=0.0)
    full, _ = adaptive_logits(model, imgs, margin=np.inf)
    margins = np.sort(
        np.partition(base[:, : model.n_cls], -2, -1)[:, -1]
        - np.partition(base[:, : model.n_cls], -2, -1)[:, -2]
    )
    thr = float(margins[len(margins) // 2])
    mixed, stats = adaptive_logits(model, imgs, margin=thr)
    assert 0 < stats["n_rescued"] < len(imgs)
    for i in range(len(imgs)):
        target = full[i] if _margin(base[i]) < thr else base[i]
        np.testing.assert_allclose(mixed[i], target, rtol=1e-4, atol=1e-4)


def _margin(row):
    top2 = np.partition(row, -2)[-2:]
    return top2[1] - top2[0]


def test_mask_excludes_padding_from_rescue(model, imgs):
    """Padding rows (mask=False) are never 'hard': n_rescued counts valid
    rows only and rescue_frac is a fraction of valid samples (<= 1)."""
    mask = np.array([True] * 5 + [False] * 3)
    logits, stats = adaptive_logits(model, imgs, margin=np.inf, mask=mask)
    assert stats["n"] == 5
    assert stats["n_rescued"] == 5  # only the valid rows
    assert stats["rescue_frac"] == 1.0
    # Valid rows still get full-path logits.
    full = np.asarray(model(imgs)["logits"], np.float32)
    np.testing.assert_allclose(logits[:5, : model.n_cls], full[:5],
                               rtol=1e-4, atol=1e-4)


def test_evaluate_adaptive_end_to_end(model, tiny_cfg, tmp_path):
    from tapclip_tpu.data.imagefolder import get_dataloaders
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = str(tmp_path / "imgs")
    build_imagefolder(root, CLASSES, per_class=6, image_size=tiny_cfg.image_size)
    _, vl = get_dataloaders(root, CLASSES, num_shots=0, verbose=False,
                            image_size=tiny_cfg.image_size)
    acc, stats = evaluate_adaptive(model, vl, margin=1.0)
    assert 0.0 <= acc <= 100.0
    assert stats["total"] > 0
    assert 0.0 <= stats["rescue_frac"] <= 1.0
