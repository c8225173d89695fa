"""Trainer engine tests: fit loop, early stopping, fine-tune helper, resume."""

import os

import numpy as np
import pytest

from tapclip_tpu.config import PromptConfig, TrainConfig
from tapclip_tpu.data.imagefolder import get_dataloaders
from tapclip_tpu.data.preprocess import make_preprocess
from tapclip_tpu.models import clip as C
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.trainer import (
    cache_features,
    evaluate_cached,
    fine_tune_on_few_shot,
    fit_prompt_model,
)

CLASSES = ["A", "B", "C"]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Class-colored images: learnable task."""
    from PIL import Image

    root = str(tmp_path_factory.mktemp("fit"))
    rng = np.random.default_rng(0)
    for ci, name in enumerate(CLASSES):
        d = os.path.join(root, name)
        os.makedirs(d)
        base = np.zeros(3)
        base[ci] = 200
        for i in range(10):
            arr = np.clip(base + rng.normal(0, 25, (32, 32, 3)), 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))
    return root


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


@pytest.fixture(scope="module")
def loaders(tree, tiny_cfg):
    return get_dataloaders(
        tree, CLASSES, batch_size=8, num_shots=5,
        preprocess=make_preprocess(tiny_cfg.image_size),
        image_size=tiny_cfg.image_size, verbose=False,
    )


def test_fit_improves_accuracy(model, loaders):
    train_loader, val_loader = loaders
    before, _ = evaluate_cached(model, cache_features(model, val_loader))
    result = fit_prompt_model(
        model, train_loader, val_loader,
        TrainConfig(lr=5e-2, epochs=8, patience=10), verbose=False,
    )
    assert result.best_acc >= before
    assert result.loss_history[-1] < result.loss_history[0]
    assert len(result.attr_entropy) == result.epochs_run
    assert result.final_state is not None


def test_early_stopping(model, loaders):
    train_loader, val_loader = loaders
    result = fit_prompt_model(
        model, train_loader, val_loader,
        TrainConfig(lr=0.0, epochs=50, patience=2), verbose=False,
    )
    # lr=0 -> accuracy never improves after epoch 1 -> stops at patience
    assert result.epochs_run <= 4


def test_fine_tune_on_few_shot(model, loaders):
    train_loader, _ = loaders
    ctx_before = np.asarray(model.trainable["ctx"]).copy()
    fine_tune_on_few_shot(model, train_loader, steps=2, lr=5e-3)
    assert not np.allclose(ctx_before, np.asarray(model.trainable["ctx"]))


def test_resume_state_roundtrip(model, loaders, tmp_path):
    """Mid-training resume: save state, resume, trajectories continue."""
    from tapclip_tpu.utils.checkpoint import (
        restore_prompt_checkpoint,
        save_prompt_checkpoint,
    )

    train_loader, val_loader = loaders
    cfg = TrainConfig(lr=1e-2, epochs=2, patience=10)
    r1 = fit_prompt_model(model, train_loader, val_loader, cfg, verbose=False)
    path = str(tmp_path / "ck")
    save_prompt_checkpoint(
        path,
        trainable=r1.final_state.params,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        opt_state=r1.final_state.opt_state,
        step=int(r1.final_state.step),
    )
    tree = restore_prompt_checkpoint(path)
    resume = {
        "trainable": tree["trainable"],
        "opt_state": tree["opt_state"],
        "step": tree["meta"]["step"],
    }
    r2 = fit_prompt_model(
        model, train_loader, val_loader, cfg, resume_state=resume, verbose=False
    )
    assert int(r2.final_state.step) > int(r1.final_state.step)
    np.testing.assert_allclose(
        np.asarray(r1.final_state.params["ctx"]),
        np.asarray(tree["trainable"]["ctx"]),
    )
