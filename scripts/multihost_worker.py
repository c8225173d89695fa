"""Worker for the 2-process x 4-virtual-device multi-host CPU simulation.

Drives ``make_multihost_mesh``'s ``create_hybrid_device_mesh`` branch
(parallel/mesh.py) with a REAL ``jax.distributed`` multi-controller setup —
the ("dcn", "ici") stacking that a v5e multi-host pod would use, simulated
with CPU devices.  Launched by tests/test_multihost.py (and usable manually:
run two of these with process ids 0 and 1).

Each process: initialize jax.distributed -> build the hybrid mesh -> run a
cross-host sharded reduction -> run ONE sharded prompt-tune train step with
the batch split across processes -> print the loss (must match on both).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tapclip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_multihost_mesh

    mesh = make_multihost_mesh(tp=2)  # (data=2*nproc? no: dp_per_host=2) x (model=2)
    dp = mesh.shape[DATA_AXIS]
    assert mesh.shape[MODEL_AXIS] == 2
    assert dp * 2 == 4 * nproc, dict(mesh.shape)
    print(f"[worker {pid}] hybrid mesh {dict(mesh.shape)} over {jax.device_count()} devices")

    # Cross-host sharded reduction: the sum must see every shard.
    total = jax.jit(
        lambda: jnp.sum(
            jax.lax.with_sharding_constraint(
                jnp.arange(dp * 16, dtype=jnp.float32).reshape(dp, 16),
                NamedSharding(mesh, P(DATA_AXIS, None)),
            )
        )
    )()
    n = dp * 16
    expect = n * (n - 1) / 2
    assert float(total) == expect, (float(total), expect)

    # One sharded train step: batch split across processes (DCN) and local
    # devices (ICI), params/bank replicated.
    from tapclip_tpu.config import TINY_TEST, PromptConfig, TrainConfig
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import init_trainable
    from tapclip_tpu.models.prompt_learner import PromptLearner
    from tapclip_tpu.parallel.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = TINY_TEST
    pcfg = PromptConfig(max_classes=8)
    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    learner = PromptLearner(
        ["Backpack", "Pen", "Mug"], params, cfg, pcfg,
        get_tokenizer(context_length=cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, pcfg)

    B = 2 * dp  # 2 samples per data shard (global)
    rng = np.random.default_rng(0)  # same global batch on both processes
    images = rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    labels = rng.integers(0, 3, B).astype(np.int32)
    mask = np.ones((B,), bool)
    # Each process contributes its local slice of the global batch.
    lo, hi = pid * B // nproc, (pid + 1) * B // nproc
    images, labels, mask = images[lo:hi], labels[lo:hi], mask[lo:hi]

    with mesh:
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        bank = jax.device_put(learner.bank, repl)
        optimizer = make_optimizer(TrainConfig(lr=1e-2))
        state = jax.device_put(init_train_state(trainable, optimizer), repl)
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        gb = [
            jax.make_array_from_process_local_data(batch_sh, arr)
            for arr in (images, labels, mask)
        ]
        step = make_train_step(cfg, pcfg, optimizer, use_image_feats=False)
        state, metrics = step(params, state, bank, *gb)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss
        print(f"[worker {pid}] MULTIHOST_OK loss={loss:.6f}")


if __name__ == "__main__":
    main()
