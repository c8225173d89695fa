"""Sweep driver: grid coverage, shared feature cache, artifacts."""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

CLASSES = ["Backpack", "Pen"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepdata")
    rng = np.random.default_rng(0)
    for ci, name in enumerate(CLASSES):
        d = root / name
        d.mkdir()
        base = np.zeros(3)
        base[ci] = 180
        for i in range(10):
            arr = np.clip(base + rng.normal(0, 25, (32, 32, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.jpg")
    return str(root)


def test_run_sweep_grid(data_root, tiny_cfg, tiny_params, tiny_prompt_cfg):
    from tapclip_tpu.config import TrainConfig
    from tapclip_tpu.sweep import run_sweep, write_artifacts

    rows = run_sweep(
        tiny_params,
        tiny_cfg,
        data_root=data_root,
        class_names=CLASSES,
        base_prompt_cfg=tiny_prompt_cfg,
        base_train_cfg=TrainConfig(batch_size=8, patience=3),
        lrs=[5e-2, 1e-2],
        shots=[3],
        adjustors=["scale", "gate"],
        seeds=[0],
        epochs=2,
    )
    assert len(rows) == 4  # 2 lrs x 2 adjustors
    combos = {(r["lr"], r["adjustor"]) for r in rows}
    assert combos == {(5e-2, "scale"), (5e-2, "gate"),
                      (1e-2, "scale"), (1e-2, "gate")}
    for r in rows:
        assert 0.0 <= r["best_acc"] <= 100.0
        assert r["epochs_run"] >= 1

    out_dir = os.path.join(data_root, "..", "sweep_out")
    out = write_artifacts(rows, out_dir)
    with open(out["csv"]) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 4
    with open(os.path.join(out_dir, "best.json")) as f:
        best = json.load(f)
    assert best["best_acc"] == max(r["best_acc"] for r in rows)


def test_sweep_rejects_zero_shot_cells(data_root, tiny_cfg, tiny_params,
                                       tiny_prompt_cfg):
    from tapclip_tpu.config import TrainConfig
    from tapclip_tpu.sweep import run_sweep

    with pytest.raises(ValueError, match="zero-shot"):
        run_sweep(
            tiny_params, tiny_cfg, data_root=data_root, class_names=CLASSES,
            base_prompt_cfg=tiny_prompt_cfg, base_train_cfg=TrainConfig(),
            shots=[0], epochs=1,
        )


def test_sweep_cli(data_root, tmp_path):
    from tapclip_tpu.sweep import main

    out = main([
        "--data-root", data_root, "--classes", *CLASSES,
        "--out", str(tmp_path / "s"), "--preset", "tiny",
        "--lrs", "5e-2", "--shots", "3", "--epochs", "1",
    ])
    assert out["n_cells"] == 1
    assert os.path.exists(out["csv"])
