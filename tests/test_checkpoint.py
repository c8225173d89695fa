"""Checkpoint tests: Orbax round-trip, reference .pt interop (both layouts),
open_clip converter key handling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tapclip_tpu.config import PromptConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models.model_wrapper import FullModel, init_trainable
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.utils.checkpoint import (
    load_any_prompt_checkpoint,
    restore_prompt_checkpoint,
    save_prompt_checkpoint,
)
from tapclip_tpu.utils.torch_convert import (
    convert_prompt_state_dict,
    load_torch_file,
)


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(["Backpack", "Pen"], tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


def test_orbax_roundtrip(model, tmp_path):
    path = str(tmp_path / "ckpt")
    save_prompt_checkpoint(
        path,
        trainable=model.trainable,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        step=7,
        extra_meta={"best_acc": 91.5},
    )
    tree = restore_prompt_checkpoint(path)
    assert tree["meta"]["class_names"] == ["Backpack", "Pen"]
    assert tree["meta"]["step"] == 7
    assert tree["meta"]["best_acc"] == 91.5
    np.testing.assert_allclose(
        tree["trainable"]["ctx"], np.asarray(model.trainable["ctx"])
    )
    np.testing.assert_allclose(
        tree["bank"]["token_embs"], np.asarray(model.prompt_learner.bank.token_embs)
    )


def test_orbax_with_opt_state(model, tmp_path):
    import optax

    from tapclip_tpu.config import TrainConfig
    from tapclip_tpu.parallel.train_step import init_train_state, make_optimizer

    opt = make_optimizer(TrainConfig())
    state = init_train_state(model.trainable, opt)
    path = str(tmp_path / "ckpt_opt")
    save_prompt_checkpoint(
        path,
        trainable=state.params,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        opt_state=state.opt_state,
        step=3,
    )
    tree = restore_prompt_checkpoint(path)
    assert "opt_state" in tree


def test_legacy_context_emb_migration():
    """test_cross_domain.py:44-61: stacked context_emb -> per-class bank."""
    sd = {
        "prompt_learner.context_emb": np.random.randn(3, 5, 16).astype(np.float32),
        "logit_scale": np.asarray(2.0, np.float32),
        "unrelated.key": np.zeros(2),
    }
    ctx, extras = convert_prompt_state_dict(sd, ["A", "B", "C"])
    assert set(ctx) == {"A", "B", "C"}
    np.testing.assert_allclose(ctx["B"], sd["prompt_learner.context_emb"][1])
    assert extras["logit_scale"] == 2.0


def test_legacy_2d_context_emb():
    sd = {"prompt_learner.context_emb": np.random.randn(5, 16).astype(np.float32)}
    ctx, _ = convert_prompt_state_dict(sd, ["Only"])
    assert ctx["Only"].shape == (5, 16)


def test_per_class_bank_layout():
    sd = {
        "prompt_learner.context_bank.Backpack": np.ones((5, 16), np.float32),
        "prompt_learner.context_bank.Pen": np.zeros((5, 16), np.float32),
    }
    ctx, _ = convert_prompt_state_dict(sd, ["Backpack", "Pen"])
    assert ctx["Backpack"].sum() == 5 * 16


def test_torch_pt_file_roundtrip(tmp_path, model):
    pt = str(tmp_path / "best_model_epoch27_acc99.71.pt")
    torch.save(
        {
            "prompt_learner.context_emb": torch.randn(2, 5, model.clip_cfg.text_width),
            "logit_scale": torch.tensor(1.5),
        },
        pt,
    )
    out = load_any_prompt_checkpoint(pt, ["Backpack", "Pen"])
    assert set(out["ctx_by_name"]) == {"Backpack", "Pen"}

    # Load into a model (test_cross_domain.py flow) and check it forwards.
    from tapclip_tpu.test_cross_domain import load_prompt_checkpoint_into

    load_prompt_checkpoint_into(model, pt, ["Backpack", "Pen"])
    np.testing.assert_allclose(float(model.trainable["logit_scale"]), 1.5)
    np.testing.assert_allclose(
        np.asarray(model.trainable["ctx"][0]),
        out["ctx_by_name"]["Backpack"],
        rtol=1e-6,
    )


def test_load_torch_file_tensor_conversion(tmp_path):
    pt = str(tmp_path / "x.pt")
    torch.save({"a": torch.arange(4.0), "b": torch.ones(2, 2)}, pt)
    out = load_torch_file(pt)
    assert isinstance(out["a"], np.ndarray)
    np.testing.assert_allclose(out["a"], [0, 1, 2, 3])


# ---------------------------------------------------------------------------
# CheckpointManager policies
# ---------------------------------------------------------------------------


def _mgr_save(mgr, model, step, metric=None):
    return mgr.save(
        step=step,
        trainable=model.trainable,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        metric=metric,
    )


def test_manager_keep_last_n(model, tmp_path):
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep_last_n=2)
    paths = [_mgr_save(mgr, model, s) for s in (1, 2, 3, 4)]
    mgr.close()
    assert not os.path.isdir(paths[0]) and not os.path.isdir(paths[1])
    assert os.path.isdir(paths[2]) and os.path.isdir(paths[3])
    assert mgr.latest_path == paths[3]
    # retained checkpoints stay restorable through the normal entry point
    tree = restore_prompt_checkpoint(paths[3])
    assert tree["meta"]["step"] == 4


def test_manager_keep_best_n(model, tmp_path):
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        str(tmp_path / "ckpts"), keep_last_n=1, keep_best_n=2, mode="max"
    )
    accs = {1: 10.0, 2: 80.0, 3: 40.0, 4: 70.0, 5: 20.0}
    paths = {s: _mgr_save(mgr, model, s, metric=a) for s, a in accs.items()}
    mgr.close()
    # best two by accuracy: steps 2 (80) and 4 (70); last one: step 5
    assert os.path.isdir(paths[2]) and os.path.isdir(paths[4]) and os.path.isdir(paths[5])
    assert not os.path.isdir(paths[1]) and not os.path.isdir(paths[3])
    assert mgr.best_path == paths[2]
    assert restore_prompt_checkpoint(paths[2])["meta"]["metric"] == 80.0


def test_manager_async_save(model, tmp_path):
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    with CheckpointManager(
        str(tmp_path / "ckpts"), keep_last_n=3, async_save=True
    ) as mgr:
        paths = [_mgr_save(mgr, model, s, metric=float(s)) for s in (1, 2, 3)]
        mgr.wait()
        for p in paths:
            assert os.path.isdir(p), p
    tree = restore_prompt_checkpoint(paths[-1])
    np.testing.assert_allclose(
        np.asarray(tree["trainable"]["ctx"], np.float32),
        np.asarray(model.trainable["ctx"], np.float32),
    )


def test_manager_index_survives_restart(model, tmp_path):
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    d = str(tmp_path / "ckpts")
    mgr = CheckpointManager(d, keep_last_n=2, keep_best_n=1)
    _mgr_save(mgr, model, 1, metric=99.0)
    _mgr_save(mgr, model, 2, metric=10.0)
    mgr.close()

    mgr2 = CheckpointManager(d, keep_last_n=2, keep_best_n=1)
    assert mgr2.best_path and mgr2.best_path.endswith("step_00000001")
    _mgr_save(mgr2, model, 3, metric=50.0)
    _mgr_save(mgr2, model, 4, metric=60.0)
    mgr2.close()
    # keep: best (step 1) + last two (3, 4); step 2 swept
    assert os.path.isdir(os.path.join(d, "step_00000001"))
    assert not os.path.isdir(os.path.join(d, "step_00000002"))
    assert os.path.isdir(os.path.join(d, "step_00000003"))
    assert os.path.isdir(os.path.join(d, "step_00000004"))


def test_manager_never_deletes_unknown_checkpoints(model, tmp_path):
    """Regression: the retention sweep must not rm-rf step_* directories the
    manager has no record of (lost index, foreign checkpoints)."""
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    d = tmp_path / "ckpts"
    foreign = d / "step_00000500"
    foreign.mkdir(parents=True)
    (foreign / "marker.txt").write_text("precious resume point")

    mgr = CheckpointManager(str(d), keep_last_n=1)
    _mgr_save(mgr, model, 1)
    _mgr_save(mgr, model, 2)  # sweeps step 1
    mgr.close()
    assert foreign.is_dir() and (foreign / "marker.txt").exists()
    assert not (d / "step_00000001").exists()


def test_manager_same_step_resave_mixed_metric(model, tmp_path):
    """Regression: re-saving a step without a metric after one with a metric
    must not TypeError in the retention sort (None vs float)."""
    from tapclip_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep_last_n=2, keep_best_n=1)
    _mgr_save(mgr, model, 5, metric=0.8)
    _mgr_save(mgr, model, 5)  # same step, no metric
    _mgr_save(mgr, model, 6, metric=0.9)
    mgr.close()
    assert mgr.best_path is not None
