"""Whole-driver training-loop parity vs a torch oracle.

The oracle chain so far pins forward (tests/test_full_model_oracle.py),
gradients, and a 5-step AdamW trajectory (tests/test_grad_oracle.py).
This file pins the FULL reference driver loop (``/root/reference/train.py:
90-133``): a real synthetic ImageFolder decoded through this repo's
pipeline, multi-epoch training with per-epoch validation, greedy
best-state tracking with patience early-stopping, and the saved best
checkpoint — asserting per-epoch losses, per-epoch val accuracies, the
number of epochs actually run, the selected best state, and
checkpoint-file equivalence between ``tapclip_tpu.trainer.fit_prompt_model``
and a line-faithful torch reimplementation of the reference's ``train()``
control flow.

Both sides consume the SAME cached image features (the frozen tower is
outside the gradient path; its parity vs torch is pinned at tolerance in
tests/test_clip_model.py — feeding identical features here keeps this test
about the loop, not about tolerance stacking) and the same deterministic
per-epoch batch order (``trainer._batches`` with seed+epoch on both sides,
mirroring that data order is an implementation detail while loss/accuracy/
early-stop semantics are the contract).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.trainer import CachedSet, _batches, cache_features, fit_prompt_model

from tests.test_full_model_oracle import CFG, CLASSES, PCFG, TOKENIZER
from tests.test_grad_oracle import _torch_forward

EPOCHS = 8
PATIENCE = 2
LR = 5e-2  # high enough that accuracy moves (and can regress -> patience fires)
WD = 0.01
BATCH = 4  # 3 classes x 4 shots = 12 train samples -> 3 full batches, no pad


@pytest.fixture(scope="module")
def torch_model():
    from tests.test_clip_model import TorchCLIP

    torch.manual_seed(7)
    m = TorchCLIP(CFG).eval()
    for p in m.parameters():
        p.requires_grad_(False)
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

    return jax.tree.map(
        jnp.asarray,
        convert_openclip_state_dict(torch_model.openclip_state_dict(), CFG),
    )


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    """Color-separable ImageFolder at the oracle geometry (32px)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("loop_oracle") / "train"
    rng = np.random.default_rng(3)
    colors = {"Backpack": (30, 30, 200), "Pen": (30, 200, 30),
              "Mug": (200, 30, 30)}
    for name, c in colors.items():
        d = root / name
        d.mkdir(parents=True)
        for i in range(10):
            arr = np.clip(
                np.array(c)[None, None] + rng.normal(0, 25, (32, 32, 3)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def caches(folder, jax_params):
    """(train, val) CachedSets through the repo's real data + tower path."""
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader, few_shot_split

    index = ImageFolderIndex.scan(folder)
    split = few_shot_split(index, CLASSES, 4, seed=0)
    model = FullModel(CLASSES, jax_params, CFG, prompt_cfg=PCFG,
                      tokenizer=TOKENIZER)
    mk = dict(image_size=CFG.image_size)
    train = cache_features(model, Loader(split.train, 8, shuffle=False, **mk))
    val = cache_features(model, Loader(split.val, 8, shuffle=False, **mk))
    assert len(train.labels) == 12 and len(val.labels) == 18
    return train, val


def _torch_eval(torch_model, ctx_detached, cached: CachedSet) -> float:
    """Reference evaluate_accuracy over cached features (eval_metrics.py)."""
    correct = total = 0
    with torch.no_grad():
        for feats, labels, mask in _batches(cached, 8, shuffle=False, seed=0):
            m = np.asarray(mask)
            logits, _, _ = _torch_forward(
                torch_model, ctx_detached,
                torch.from_numpy(np.asarray(feats)),
                torch.from_numpy(np.asarray(labels).astype(np.int64)),
            )
            pred = logits.argmax(-1).numpy()
            correct += int(((pred == np.asarray(labels)) & m).sum())
            total += int(m.sum())
    return 100.0 * correct / max(total, 1)


def _torch_train_driver(torch_model, learner, train_c, val_c):
    """Line-faithful torch port of the reference train() loop
    (train.py:90-133): per-epoch avg loss, val accuracy, greedy best-state
    tracking, ``current == patience`` break, best state returned."""
    ctx_t = [
        torch.from_numpy(np.array(learner.bank.ctx[i])).requires_grad_(True)
        for i in range(len(CLASSES))
    ]
    opt = torch.optim.AdamW(ctx_t, lr=LR, weight_decay=WD)
    best_acc, current = 0.0, 0
    best_ctx = [c.detach().clone() for c in ctx_t]
    loss_hist, acc_hist = [], []
    for epoch in range(1, EPOCHS + 1):
        total_loss, nb = 0.0, 0
        for feats, labels, _mask in _batches(
            train_c, BATCH, shuffle=True, seed=0 + epoch
        ):
            _, loss, _ = _torch_forward(
                torch_model, ctx_t,
                torch.from_numpy(np.asarray(feats)),
                torch.from_numpy(np.asarray(labels).astype(np.int64)),
            )
            total_loss += float(loss.item())
            nb += 1
            opt.zero_grad()
            loss.backward()
            opt.step()
        loss_hist.append(total_loss / nb)
        acc = _torch_eval(torch_model, [c.detach() for c in ctx_t], val_c)
        acc_hist.append(acc)
        if acc > best_acc:
            best_acc = acc
            current = 0
            best_ctx = [c.detach().clone() for c in ctx_t]
        else:
            current += 1
            if current == PATIENCE:
                break
    return {
        "loss": loss_hist,
        "acc": acc_hist,
        "best_acc": best_acc,
        "best_ctx": np.stack([c.numpy() for c in best_ctx]),
        "epochs_run": len(loss_hist),
    }


@pytest.fixture(scope="module")
def oracle(torch_model, jax_params, caches):
    learner = FullModel(CLASSES, jax_params, CFG, prompt_cfg=PCFG,
                        tokenizer=TOKENIZER).prompt_learner
    return _torch_train_driver(torch_model, learner, *caches)


@pytest.fixture(scope="module")
def fit(jax_params, caches):
    model = FullModel(CLASSES, jax_params, CFG, prompt_cfg=PCFG,
                      tokenizer=TOKENIZER)
    result = fit_prompt_model(
        model, caches[0], caches[1],
        TrainConfig(lr=LR, weight_decay=WD, epochs=EPOCHS, patience=PATIENCE,
                    batch_size=BATCH, seed=0),
        verbose=False,
    )
    return result


def test_epoch_losses_match(oracle, fit):
    assert len(fit.loss_history) == len(oracle["loss"])
    np.testing.assert_allclose(fit.loss_history, oracle["loss"],
                               rtol=2e-4, atol=2e-5)


def test_val_accuracies_match_exactly(oracle, fit):
    """Accuracy is a discrete count over identical features — exact match."""
    assert fit.acc_history == oracle["acc"]


def test_early_stopping_fires_identically(oracle, fit):
    assert fit.epochs_run == oracle["epochs_run"]
    # the loop must actually have early-stopped for this test to carry its
    # weight; if it saturates at EPOCHS the patience path went untested
    assert oracle["epochs_run"] < EPOCHS, (
        "tune LR/EPOCHS so the patience break fires"
    )


def test_best_state_selection_matches(oracle, fit):
    assert fit.best_acc == oracle["best_acc"]
    assert int(np.argmax(fit.acc_history)) == int(np.argmax(oracle["acc"]))
    C = len(CLASSES)
    np.testing.assert_allclose(
        np.asarray(fit.best_trainable["ctx"])[:C], oracle["best_ctx"],
        rtol=1e-4, atol=1e-5,
    )


def test_saved_checkpoint_equivalence(oracle, fit, jax_params, tmp_path):
    """The persisted artifact (what the reference's torch.save(best_state)
    ends up as, train.py:131-133) restores to the oracle's best context."""
    from tapclip_tpu.utils.checkpoint import (
        load_any_prompt_checkpoint,
        save_prompt_checkpoint,
    )

    model = FullModel(CLASSES, jax_params, CFG, prompt_cfg=PCFG,
                      tokenizer=TOKENIZER)
    path = save_prompt_checkpoint(
        str(tmp_path / "best_ckpt"),
        trainable=fit.best_trainable,
        bank=model.prompt_learner.bank,
        class_names=CLASSES,
    )
    loaded = load_any_prompt_checkpoint(path, CLASSES)
    for i, name in enumerate(CLASSES):
        np.testing.assert_allclose(
            np.asarray(loaded["ctx_by_name"][name]), oracle["best_ctx"][i],
            rtol=1e-4, atol=1e-5,
        )
