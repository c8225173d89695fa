"""Driver smoke tests: train CLI, cross-domain eval CLI, fine-tune CLI,
output-artifact fidelity (CSV schema, plots, checkpoints)."""

import os

import numpy as np
import pandas as pd
import pytest

from tapclip_tpu import test_cross_domain, test_cross_domain2, train
from tapclip_tpu.data.synthetic import build_imagefolder

CLASSES = ["Backpack", "Alarm_Clock", "Laptop"]


@pytest.fixture(scope="module")
def domain_tree(tmp_path_factory):
    """Two-domain synthetic OfficeHome-style tree with class-colored images."""
    from PIL import Image

    root = str(tmp_path_factory.mktemp("domains"))
    rng = np.random.default_rng(0)
    for dom in ["Real World", "Art"]:
        for ci, name in enumerate(CLASSES + ["Clipboards"]):
            d = os.path.join(root, dom, name)
            os.makedirs(d)
            base = np.zeros(3)
            base[ci % 3] = 180
            for i in range(8):
                arr = np.clip(base + rng.normal(0, 25, (32, 32, 3)), 0, 255).astype(
                    np.uint8
                )
                Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))
    return root


def test_train_driver_end_to_end(tmp_path, domain_tree):
    out = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--epochs", "2", "--num-shots", "3", "--batch-size", "8",
            "--output-root", str(tmp_path),
        ]
    )
    assert "best_acc" in out and out["best_acc"] >= 0
    assert os.path.isdir(out["ckpt"])
    plots = os.listdir(out["paths"]["plot_dir"])
    assert any(p.endswith(".png") for p in plots)
    logs = os.listdir(out["paths"]["log_dir"])
    assert any(p.endswith(".log") for p in logs)


def test_train_driver_zero_shot(tmp_path, domain_tree):
    out = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--num-shots", "0",
            "--output-root", str(tmp_path),
        ]
    )
    assert out["best_acc"] >= 0


def test_cross_domain_driver(tmp_path, domain_tree):
    out = test_cross_domain.main(
        [
            "--preset", "tiny",
            "--domain-root", domain_tree,
            "--domains", "Real World", "Art",
            "--shots", "0", "3",
            "--seen-classes", *CLASSES,
            "--unseen-classes", "Clipboards",
            "--batch-size", "8",
            "--output-root", str(tmp_path),
        ]
    )
    df = pd.read_csv(out["csv"])
    # Output-fidelity: exact reference CSV schema (test_cross_domain.py:85-90)
    assert list(df.columns) == ["Domain", "Shots", "Accuracy"]
    assert len(df) == 2 * 2
    assert set(df["Shots"]) == {"Zero-Shot", "3-shot"}
    assert os.path.exists(out["plot"])


def test_cross_domain_ref_artifact_names(tmp_path, domain_tree):
    """--ref-artifacts reproduces the reference's exact output tree:
    'visible results/cross_domain_results_{epochs}_{acc}_{expand}.csv' and
    '..._accuracy_bar_{...}.png', where acc is the LAST grid cell's accuracy
    (the reference's shadowed loop variable, test_cross_domain.py:84,89,115)
    and epochs comes from the checkpoint basename when parseable."""
    out = test_cross_domain.main(
        [
            "--preset", "tiny",
            "--domain-root", domain_tree,
            "--domains", "Real World",
            "--shots", "0",
            "--seen-classes", *CLASSES,
            "--unseen-classes", "Clipboards",
            "--batch-size", "8",
            "--output-root", str(tmp_path),
            "--ref-artifacts", "--artifact-root", str(tmp_path),
        ]
    )
    last_acc = out["results"][-1]["Accuracy"]
    vis = tmp_path / "visible results"
    # no checkpoint given -> epochs falls back to the tiny preset's config
    from tapclip_tpu.config import preset

    epochs = preset("tiny").train.epochs
    assert out["csv"] == str(vis / f"cross_domain_results_{epochs}_{last_acc}_True.csv")
    assert out["plot"] == str(
        vis / f"cross_domain_accuracy_bar_{epochs}_{last_acc}_True.png"
    )
    assert os.path.exists(out["csv"]) and os.path.exists(out["plot"])


def test_ref_artifact_names_checkpoint_parse():
    from tapclip_tpu.test_cross_domain import ref_artifact_names

    rows = [{"Domain": "Art", "Shots": "Zero-Shot", "Accuracy": 93.75}]
    csv, png = ref_artifact_names(
        rows, "Best Models/best_model_epoch27_acc99.71.pt", 5, expand=True
    )
    # epochs from the checkpoint name; acc is the last cell's (shadowing quirk)
    assert csv == "cross_domain_results_27_93.75_True.csv"
    assert png == "cross_domain_accuracy_bar_27_93.75_True.png"
    csv2, _ = ref_artifact_names(rows, None, 5, expand=False)
    assert csv2 == "cross_domain_results_5_93.75_False.csv"


def test_cross_domain2_driver_with_checkpoint(tmp_path, domain_tree):
    # 1. Train briefly, save checkpoint.
    trained = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--epochs", "2", "--num-shots", "3", "--batch-size", "8",
            "--output-root", str(tmp_path / "train"),
        ]
    )
    # 2. Per-domain fine-tune eval from that checkpoint.
    out = test_cross_domain2.main(
        [
            "--preset", "tiny",
            "--checkpoint", trained["ckpt"],
            "--domain-root", domain_tree,
            "--domains", "Real World", "Art",
            "--shots", "0", "3",
            "--seen-classes", *CLASSES,
            "--ft-steps", "2",
            "--batch-size", "8",
            "--output-root", str(tmp_path / "xd2"),
        ]
    )
    df = pd.read_csv(out["csv"])
    assert list(df.columns) == ["Domain", "Shots", "Accuracy"]
    assert len(df) == 4
    # Zero-shot rows evaluate the restored checkpoint state (no leakage from
    # fine-tuned cells — restore_fn resets between cells).
    zs = df[df["Shots"] == "Zero-Shot"]["Accuracy"]
    assert (zs >= 0).all() and (zs <= 100).all()


def test_zero_shot_eval_driver(tmp_path, domain_tree):
    from tapclip_tpu import zero_shot_eval

    out = zero_shot_eval.main(
        [
            "--preset", "tiny",
            "--domain-root", domain_tree,
            "--domains", "Real World", "Art",
            "--classes", *CLASSES,
            "--output-root", str(tmp_path),
        ]
    )
    df = pd.read_csv(out["csv"])
    assert list(df.columns) == ["Domain", "Shots", "Accuracy"]
    assert set(df["Shots"]) == {"Zero-Shot"}
    assert len(df) == 2


def test_pretrain_cli_driver(tmp_path, domain_tree):
    from tapclip_tpu import pretrain_cli, train

    out = pretrain_cli.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--epochs", "1", "--batch-size", "8", "--lr", "1e-3",
            "--schedule", "cosine", "--warmup-steps", "1", "--grad-clip", "1.0",
            "--accum-steps", "2",
            "--output-root", str(tmp_path / "pt"),
        ]
    )
    assert len(out["loss_history"]) == 1
    assert os.path.isdir(out["ckpt"])
    # The saved tree loads as --pretrained in the train driver.
    out2 = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--epochs", "1", "--num-shots", "2", "--batch-size", "8",
            "--pretrained", out["ckpt"],
            "--output-root", str(tmp_path / "tr"),
        ]
    )
    assert out2["best_acc"] >= 0


def test_clip_wrapper_compat_api(tiny_cfg, tiny_params, rng):
    """Reference CLIPWrapper API surface (clip_wrapper.py:42-64)."""
    from tapclip_tpu.models.clip_wrapper import CLIPWrapper

    w = CLIPWrapper(cfg=tiny_cfg)
    assert w.get_attention_map() is None
    ids = w.get_tokenizer().tokenize(["a photo of a dog"], tiny_cfg.context_length)
    feats = w.encode_text(ids)
    assert feats.shape == (1, tiny_cfg.embed_dim)
    amap = w.get_attention_map()
    assert amap.shape == (1, tiny_cfg.context_length, tiny_cfg.context_length)
    # rows are probability distributions
    np.testing.assert_allclose(np.asarray(amap.sum(-1)), 1.0, rtol=1e-4)
    w.reset()
    assert w.get_attention_map() is None
    imgs = rng.standard_normal((2, tiny_cfg.image_size, tiny_cfg.image_size, 3))
    assert w.encode_image(np.asarray(imgs, np.float32)).shape == (2, tiny_cfg.embed_dim)


def test_pretrain_resume(tmp_path, domain_tree):
    """--save-every snapshots (params + opt state + epoch) resume exactly
    where they left off."""
    from tapclip_tpu import pretrain_cli

    common = [
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--batch-size", "8", "--lr", "1e-3",
    ]
    out1 = pretrain_cli.main(
        common + ["--epochs", "1", "--save-every", "1",
                  "--output-root", str(tmp_path / "p1")]
    )
    # Epoch-suffixed snapshot dirs (preemption-safe: the old one is removed
    # only after the new save finalizes); exactly one survives.
    model_dir = os.path.dirname(out1["ckpt"])
    snaps = [d for d in os.listdir(model_dir) if d.startswith("pretrain_snapshot")]
    assert snaps == ["pretrain_snapshot_e000001"]
    snap = os.path.join(model_dir, snaps[0])
    out2 = pretrain_cli.main(
        common + ["--epochs", "2", "--resume", snap,
                  "--output-root", str(tmp_path / "p2")]
    )
    # resumed run covers only the remaining epoch
    assert len(out2["loss_history"]) == 1
    assert os.path.isdir(out2["ckpt"])


def test_pretrain_cli_parallelism_flags(tmp_path, domain_tree):
    """--pp/--seq-parallel and --moe-experts reach the step builder end to
    end (virtual 8-device mesh: dp=2 x pipe=2 x model=2, then EP)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tapclip_tpu import pretrain_cli

    common = [
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--epochs", "1", "--batch-size", "8", "--lr", "1e-3",
    ]
    out = pretrain_cli.main(
        common + ["--pp", "2", "--tp", "2", "--pp-microbatches", "4",
                  "--seq-parallel", "--output-root", str(tmp_path / "pp")]
    )
    assert len(out["loss_history"]) == 1

    out2 = pretrain_cli.main(
        common + ["--tp", "2", "--moe-experts", "2",
                  "--output-root", str(tmp_path / "moe")]
    )
    assert len(out2["loss_history"]) == 1


def test_pretrain_cli_lora(tmp_path, domain_tree):
    """--lora-rank trains adapters only, snapshots/resumes the adapter tree,
    and the final checkpoint is the MERGED tree, loadable as --pretrained."""
    from tapclip_tpu import pretrain_cli, train

    common = [
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--batch-size", "8", "--lr", "1e-3", "--lora-rank", "4",
    ]
    out = pretrain_cli.main(
        common + ["--epochs", "1", "--save-every", "1",
                  "--output-root", str(tmp_path / "l1")]
    )
    assert len(out["loss_history"]) == 1
    model_dir = os.path.dirname(out["ckpt"])
    snaps = [d for d in os.listdir(model_dir) if d.startswith("pretrain_snapshot")]
    assert snaps == ["pretrain_snapshot_e000001"]
    out2 = pretrain_cli.main(
        common + ["--epochs", "2",
                  "--resume", os.path.join(model_dir, snaps[0]),
                  "--output-root", str(tmp_path / "l2")]
    )
    assert len(out2["loss_history"]) == 1
    # merged checkpoint drops into the train driver
    out3 = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--epochs", "1", "--num-shots", "2", "--batch-size", "8",
            "--pretrained", out["ckpt"],
            "--output-root", str(tmp_path / "tr"),
        ]
    )
    assert out3["best_acc"] >= 0


def test_pretrain_cli_distill(tmp_path, domain_tree):
    """--distill-teacher trains a student against a frozen teacher checkpoint
    and exports a plain CLIP tree (kd_proj stripped), loadable as
    --pretrained."""
    import orbax.checkpoint as ocp

    from tapclip_tpu import pretrain_cli, train

    common = [
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--batch-size", "8", "--lr", "1e-3",
    ]
    teacher = pretrain_cli.main(
        common + ["--epochs", "1", "--output-root", str(tmp_path / "t")]
    )
    out = pretrain_cli.main(
        common + ["--epochs", "1", "--distill-teacher", teacher["ckpt"],
                  "--kd-temp", "2.0",
                  "--output-root", str(tmp_path / "s")]
    )
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(out["ckpt"]))
    assert "kd_proj" not in tree
    out2 = train.main(
        [
            "--preset", "tiny",
            "--data-root", os.path.join(domain_tree, "Real World"),
            "--classes", *CLASSES,
            "--epochs", "1", "--num-shots", "2", "--batch-size", "8",
            "--pretrained", out["ckpt"],
            "--output-root", str(tmp_path / "tr"),
        ]
    )
    assert out2["best_acc"] >= 0


def test_pretrain_cli_uint8_transport(tmp_path, domain_tree):
    """--uint8-transfer switches the loader to uint8 batches; the step
    normalizes on device bit-identically, so one epoch over the same data
    with the same seed gives the same loss as float transport."""
    from tapclip_tpu import pretrain_cli

    common = [
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--epochs", "1", "--batch-size", "8", "--lr", "1e-3",
    ]
    f32 = pretrain_cli.main(common + ["--output-root", str(tmp_path / "a")])
    u8 = pretrain_cli.main(
        common + ["--uint8-transfer", "--output-root", str(tmp_path / "b")]
    )
    np.testing.assert_allclose(
        u8["loss_history"], f32["loss_history"], rtol=1e-5
    )


def test_pretrain_cli_zeroshot_validation(tmp_path, domain_tree):
    """--zeroshot-val-root logs per-epoch zero-shot accuracy and records it
    in pretrain_metrics.csv."""
    import csv as _csv

    from tapclip_tpu import pretrain_cli

    out = pretrain_cli.main([
        "--preset", "tiny",
        "--data-root", os.path.join(domain_tree, "Real World"),
        "--epochs", "2", "--batch-size", "8", "--lr", "1e-3",
        "--zeroshot-val-root", os.path.join(domain_tree, "Art"),
        "--zeroshot-frequency", "2",
        "--output-root", str(tmp_path / "zs"),
    ])
    csv_dir = os.path.dirname(out["ckpt"]).replace("models", "csv")
    with open(os.path.join(csv_dir, "pretrain_metrics.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 2
    # frequency 2: epoch 1 has no zero-shot column value, epoch 2 does
    assert not rows[0].get("zeroshot_acc")
    assert 0.0 <= float(rows[1]["zeroshot_acc"]) <= 100.0
