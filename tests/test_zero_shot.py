"""Zero-shot classifier tests (BASELINE.json config 1 path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.zero_shot import (
    OPENAI_IMAGENET_TEMPLATES_SMALL,
    build_zero_shot_classifier,
    class_name_to_text,
    evaluate_zero_shot,
    zero_shot_logits,
)


@pytest.fixture(scope="module")
def tok(tiny_cfg):
    return get_tokenizer(context_length=tiny_cfg.context_length)


def test_classifier_shape_and_norm(tiny_cfg, tiny_params, tok):
    w = build_zero_shot_classifier(
        tiny_params, tiny_cfg, ["Backpack", "Pen", "Mug"], tok
    )
    assert w.shape == (3, tiny_cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w), axis=-1), np.ones(3), rtol=1e-4
    )


def test_template_ensemble_differs_from_single(tiny_cfg, tiny_params, tok):
    w1 = build_zero_shot_classifier(tiny_params, tiny_cfg, ["Pen"], tok)
    w2 = build_zero_shot_classifier(
        tiny_params, tiny_cfg, ["Pen"], tok,
        templates=OPENAI_IMAGENET_TEMPLATES_SMALL[:4],
    )
    assert not np.allclose(np.asarray(w1), np.asarray(w2))


def test_logits_shape(tiny_cfg, tiny_params, tok, rng):
    w = build_zero_shot_classifier(tiny_params, tiny_cfg, ["A", "B"], tok)
    imgs = jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    logits = zero_shot_logits(tiny_params, tiny_cfg, w, imgs)
    assert logits.shape == (4, 2)
    scale = float(np.exp(np.asarray(tiny_params["logit_scale"])))
    assert (np.abs(np.asarray(logits)) <= scale * 1.0001).all()


def test_underscore_names():
    assert class_name_to_text("Alarm_Clock") == "Alarm Clock"


def test_evaluate_zero_shot_loader(tiny_cfg, tiny_params, tok, tmp_path):
    from tapclip_tpu.data.imagefolder import get_dataloaders
    from tapclip_tpu.data.preprocess import make_preprocess
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = str(tmp_path)
    build_imagefolder(root, ["A", "B"], per_class=4, image_size=16)
    _, val = get_dataloaders(
        root, ["A", "B"], num_shots=0, verbose=False,
        preprocess=make_preprocess(tiny_cfg.image_size),
        image_size=tiny_cfg.image_size,
    )
    w = build_zero_shot_classifier(tiny_params, tiny_cfg, ["A", "B"], tok)
    acc = evaluate_zero_shot(tiny_params, tiny_cfg, w, val)
    assert 0.0 <= acc <= 100.0
