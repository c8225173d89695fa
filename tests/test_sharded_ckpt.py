"""Sharded (no-host-gather) snapshots: save/restore straight between mesh
layouts.

The reference's torch.save materializes the full state on the host
(/root/reference/train.py:131-133); the FSDP/ZeRO path exists precisely to
avoid holding the full tree anywhere, so its snapshots must stream each
device's shards (utils/checkpoint.py::save_sharded_snapshot) and restore
into whatever mesh layout the resuming run uses — same topology, or a
different one via Orbax resharding.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.parallel.mesh import make_mesh
from tapclip_tpu.parallel.sharding import shard_opt_state, shard_params
from tapclip_tpu.utils.checkpoint import (
    abstract_target,
    restore_sharded_snapshot,
    save_sharded_snapshot,
    snapshot_format,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _fsdp_state(cfg, mesh):
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-2, weight_decay=0.01)
    params = shard_params(params, mesh, fsdp=True)
    opt_state = shard_opt_state(opt.init(params), mesh, fsdp=True)
    return params, opt_state


def _tree_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fsdp_snapshot_roundtrip_same_topology(tiny_cfg, tmp_path):
    mesh = make_mesh(dp=8)
    params, opt_state = _fsdp_state(tiny_cfg, mesh)
    snap = str(tmp_path / "snap")
    save_sharded_snapshot(
        snap, {"params": params, "opt_state": opt_state, "epoch": 3,
               "gstep": 70}
    )
    target = {
        "params": abstract_target(params),
        "opt_state": abstract_target(opt_state),
        "epoch": 0,
        "gstep": 0,
    }
    r = restore_sharded_snapshot(snap, target)
    assert int(r["epoch"]) == 3 and int(r["gstep"]) == 70
    _tree_equal(r["params"], params)
    _tree_equal(r["opt_state"], opt_state)
    # The restore must land in the FSDP layout, not replicated: the big
    # 2-D weights keep their sharding and each device holds 1/8 rows.
    big = r["params"]["visual"]["blocks"]["mlp"]["w_fc"]
    ref = params["visual"]["blocks"]["mlp"]["w_fc"]
    assert big.sharding == ref.sharding
    assert not big.sharding.is_fully_replicated
    # [L, W, H] with P(None, "data", None) under dp=8: 1/8 per device.
    assert big.addressable_shards[0].data.size * 8 == big.size


def test_snapshot_reshards_across_topologies(tiny_cfg, tmp_path):
    """Save under dp=8 FSDP, restore into a dp=4 mesh (half the devices):
    Orbax reshards on read; values identical, new layout honored."""
    mesh8 = make_mesh(dp=8)
    params8, opt8 = _fsdp_state(tiny_cfg, mesh8)
    snap = str(tmp_path / "snap")
    save_sharded_snapshot(snap, {"params": params8, "opt_state": opt8})

    mesh4 = make_mesh(dp=4, devices=jax.devices()[:4])
    params4, opt4 = _fsdp_state(tiny_cfg, mesh4)
    r = restore_sharded_snapshot(
        snap,
        {"params": abstract_target(params4),
         "opt_state": abstract_target(opt4)},
    )
    _tree_equal(r["params"], params8)
    big = r["params"]["visual"]["blocks"]["mlp"]["w_fc"]
    assert len(big.sharding.device_set) == 4
    assert not big.sharding.is_fully_replicated


def test_cli_sharded_snapshot_resume(tmp_path):
    """pretrain_cli --sharded-snapshot --fsdp: snapshots save the live
    sharded trees, and --resume restores after mesh placement, covering
    exactly the remaining epochs."""
    from tapclip_tpu import pretrain_cli
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = build_imagefolder(
        str(tmp_path / "data"), ["Backpack", "Alarm_Clock"], per_class=8
    )
    common = [
        "--preset", "tiny",
        "--data-root", root,
        "--batch-size", "8", "--lr", "1e-3",
        "--dp", "8", "--fsdp", "--sharded-snapshot",
    ]
    out1 = pretrain_cli.main(
        common + ["--epochs", "1", "--save-every", "1",
                  "--output-root", str(tmp_path / "p1")]
    )
    model_dir = os.path.dirname(out1["ckpt"])
    snaps = [d for d in os.listdir(model_dir)
             if d.startswith("pretrain_snapshot")]
    assert snaps == ["pretrain_snapshot_e000001"]
    out2 = pretrain_cli.main(
        common + ["--epochs", "2",
                  "--resume", os.path.join(model_dir, snaps[0]),
                  "--output-root", str(tmp_path / "p2")]
    )
    assert len(out2["loss_history"]) == 1  # only the remaining epoch ran
    assert os.path.isdir(out2["ckpt"])


def test_snapshot_format_probe(tmp_path):
    """snapshot_format discriminates the two save paths by the recorded
    handler (the OCDBT file layout is identical for both)."""
    import orbax.checkpoint as ocp

    sharded = str(tmp_path / "sharded")
    save_sharded_snapshot(sharded, {"x": jnp.arange(4.0)})
    assert snapshot_format(sharded) == "sharded"

    host = str(tmp_path / "host")
    ocp.PyTreeCheckpointer().save(host, {"x": np.arange(4.0)}, force=True)
    assert snapshot_format(host) == "host"

    assert snapshot_format(str(tmp_path / "nope")) is None


def _tiny_cli_args(root, tmp_path, tag):
    return [
        "--preset", "tiny",
        "--data-root", root,
        "--batch-size", "8", "--lr", "1e-3",
        "--dp", "8", "--fsdp",
        "--output-root", str(tmp_path / tag),
    ]


def test_cli_sharded_resume_host_snapshot_clear_error(tmp_path):
    """Pointing --resume at a HOST-format snapshot while --sharded-snapshot
    is set (and the structure has drifted) fails with a clear message, not
    an opaque Orbax structure error."""
    from tapclip_tpu import pretrain_cli
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = build_imagefolder(
        str(tmp_path / "data"), ["Backpack", "Alarm_Clock"], per_class=8
    )
    out1 = pretrain_cli.main(
        _tiny_cli_args(root, tmp_path, "p1")
        + ["--epochs", "1", "--save-every", "1"]  # host snapshot (no flag)
    )
    snap = os.path.join(os.path.dirname(out1["ckpt"]),
                        "pretrain_snapshot_e000001")
    assert snapshot_format(snap) == "host"
    with pytest.raises(SystemExit, match="host-format"):
        pretrain_cli.main(
            _tiny_cli_args(root, tmp_path, "p2")
            + ["--epochs", "2", "--sharded-snapshot", "--schedule", "cosine",
               "--resume", snap]
        )


def test_cli_sharded_resume_optimizer_drift(tmp_path):
    """Resuming a sharded snapshot after an optimizer tweak that keeps the
    leaf count (--grad-clip wraps the chain in a stateless transform) merges
    the saved moments into the new structure and completes the run."""
    from tapclip_tpu import pretrain_cli
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = build_imagefolder(
        str(tmp_path / "data"), ["Backpack", "Alarm_Clock"], per_class=8
    )
    out1 = pretrain_cli.main(
        _tiny_cli_args(root, tmp_path, "p1")
        + ["--epochs", "1", "--save-every", "1", "--sharded-snapshot"]
    )
    snap = os.path.join(os.path.dirname(out1["ckpt"]),
                        "pretrain_snapshot_e000001")
    assert snapshot_format(snap) == "sharded"
    out2 = pretrain_cli.main(
        _tiny_cli_args(root, tmp_path, "p2")
        + ["--epochs", "2", "--sharded-snapshot", "--grad-clip", "1.0",
           "--resume", snap]
    )
    assert len(out2["loss_history"]) == 1  # only the remaining epoch ran

    # Leaf-count drift (--schedule cosine adds a schedule counter): params
    # resume, optimizer state restarts fresh — loudly, not with a crash.
    out3 = pretrain_cli.main(
        _tiny_cli_args(root, tmp_path, "p3")
        + ["--epochs", "2", "--sharded-snapshot", "--schedule", "cosine",
           "--resume", snap]
    )
    assert len(out3["loss_history"]) == 1
