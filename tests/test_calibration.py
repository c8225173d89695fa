"""Confusion-matrix + temperature-calibration readouts.

The fitter must recover a known temperature from synthetically
miscalibrated logits, ECE must behave at its fixed points, and the train
CLI must emit the artifacts.
"""

import os

import numpy as np
import pytest

from tapclip_tpu.utils.calibration import (
    calibrate,
    expected_calibration_error,
    fit_temperature,
)
from tapclip_tpu.utils.eval_metrics import confusion_matrix


def _calibrated_logits(n, C, rng):
    """Logits whose softmax IS the label-generating distribution (T*=1)."""
    logits = rng.normal(0.0, 2.0, (n, C))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    labels = np.array([rng.choice(C, p=row) for row in p])
    return logits.astype(np.float32), labels.astype(np.int32)


def test_fit_temperature_recovers_scale():
    rng = np.random.default_rng(0)
    logits, labels = _calibrated_logits(4000, 5, rng)
    for true_T in (1.0, 4.0, 0.5):
        T = fit_temperature(logits * true_T, labels)
        assert abs(T - true_T) / true_T < 0.15, (true_T, T)


def test_fit_temperature_respects_mask():
    rng = np.random.default_rng(1)
    logits, labels = _calibrated_logits(2000, 4, rng)
    # garbage rows that would skew the fit are masked out
    bad = rng.normal(0.0, 10.0, logits.shape).astype(np.float32)
    all_logits = np.concatenate([logits * 3.0, bad])
    all_labels = np.concatenate([labels, labels])
    mask = np.concatenate([np.ones(2000, bool), np.zeros(2000, bool)])
    T = fit_temperature(all_logits, all_labels, mask)
    assert abs(T - 3.0) / 3.0 < 0.2, T


def test_ece_fixed_points():
    # perfectly confident and correct -> 0
    probs = np.eye(4)[np.array([0, 1, 2, 3])]
    assert expected_calibration_error(probs, np.arange(4)) == 0.0
    # confidence 0.9, accuracy 0.5 -> ECE ~ 0.4
    n = 1000
    probs = np.full((n, 2), 0.1)
    probs[:, 0] = 0.9
    labels = np.zeros(n, np.int64)
    labels[: n // 2] = 1  # half wrong
    assert abs(expected_calibration_error(probs, labels) - 0.4) < 0.01


def test_calibrate_reduces_ece():
    rng = np.random.default_rng(2)
    logits, labels = _calibrated_logits(3000, 5, rng)

    class StubModel:
        n_cls = 5

        def __call__(self, images):
            return {"logits": logits[images]}  # "images" = row indices

    loader = [
        (np.arange(i, i + 500), labels[i : i + 500], np.ones(500, bool))
        for i in range(0, 3000, 500)
    ]
    model = StubModel()
    # overconfident model: scale the stub's logits by 5
    logits = logits * 5.0
    out = calibrate(model, loader)
    assert abs(out["temperature"] - 5.0) / 5.0 < 0.15
    assert out["ece_after"] < out["ece_before"]
    assert out["n"] == 3000


def test_confusion_matrix_counts():
    C = 3
    preds = np.array([0, 0, 1, 2, 2, 2, 1, 0])
    labels = np.array([0, 1, 1, 2, 2, 0, 1, 0])
    onehot = np.eye(C)[preds] * 10.0

    class StubModel:
        n_cls = C

        def __call__(self, idx):
            return {"logits": onehot[idx]}

    # two batches, second has a masked pad row that must not count
    loader = [
        (np.arange(0, 4), labels[:4], np.ones(4, bool)),
        (np.arange(4, 8), labels[4:], np.array([True, True, True, False])),
    ]
    cm = confusion_matrix(StubModel(), loader)
    expected = np.zeros((C, C), np.int64)
    for t, p in zip(labels[:7], preds[:7]):
        expected[t, p] += 1
    np.testing.assert_array_equal(cm, expected)
    assert cm.sum() == 7  # masked row excluded


def test_train_cli_emits_artifacts(tmp_path):
    from PIL import Image

    from tapclip_tpu import train

    rng = np.random.default_rng(3)
    classes = ["Backpack", "Pen"]
    root = tmp_path / "data"
    for ci, name in enumerate(classes):
        d = root / name
        d.mkdir(parents=True)
        base = np.zeros(3)
        base[ci] = 180
        for i in range(8):
            arr = np.clip(base + rng.normal(0, 25, (32, 32, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.jpg")

    out = train.main([
        "--preset", "tiny", "--data-root", str(root), "--classes", *classes,
        "--epochs", "1", "--num-shots", "3", "--batch-size", "8",
        "--output-root", str(tmp_path / "out"), "--confusion", "--calibrate",
    ])
    csv_dir = out["paths"]["csv_dir"]
    cm_files = [f for f in os.listdir(csv_dir) if f.endswith("_confusion.csv")]
    assert cm_files
    cm = np.loadtxt(os.path.join(csv_dir, cm_files[0]), delimiter=",",
                    skiprows=1)
    assert cm.shape == (2, 2) and cm.sum() > 0
    import json

    with open(os.path.join(csv_dir, "calibration.json")) as f:
        calib = json.load(f)
    assert calib["temperature"] > 0 and calib["n"] > 0
    plots = os.listdir(out["paths"]["plot_dir"])
    assert any(p.endswith("_confusion.png") for p in plots)
