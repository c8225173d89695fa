"""Full-tower CLIP pretraining step throughput on the current backend.

Measures the contrastive (fwd + bwd through BOTH towers + AdamW) step at
real shapes — the workload where the dedicated Pallas backward kernels
matter.  Data generated on device; one jitted dispatch per timed step with
donated (params, opt_state); single block at the end (tunnel protocol).

Usage: python scripts/pretrain_bench.py [batch=128] [model=ViT-B-16] [steps=10]
                                        [remat=none|dots|full] [loss=infonce|siglip]
                                        [unroll=1] [moe_experts=0] [patch_dropout=0]
                                        [augment=0] [accum=1]

accum=K times make_accum_pretrain_step (GradCache full-negative
accumulation) on a K*batch macro batch — img/s is per MACRO sample, so the
expected cost vs the plain step at the same TOTAL batch is ~1.3x (2 fwd +
1 bwd per sample).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from tapclip_tpu.config import MODEL_PRESETS
from tapclip_tpu.models import clip as C
from tapclip_tpu.pretrain import (
    add_siglip_params,
    make_accum_pretrain_step,
    make_pretrain_step,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    remat = sys.argv[4] if len(sys.argv) > 4 else "none"
    loss = sys.argv[5] if len(sys.argv) > 5 else "infonce"
    unroll = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    moe = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    patch_dropout = float(sys.argv[8]) if len(sys.argv) > 8 else 0.0
    use_augment = int(sys.argv[9]) if len(sys.argv) > 9 else 0
    accum = int(sys.argv[10]) if len(sys.argv) > 10 else 1
    cfg = MODEL_PRESETS[name].replace(
        dtype="bfloat16", remat=remat, scan_unroll=unroll, moe_experts=moe,
        patch_dropout=patch_dropout,
    )
    print(f"backend={jax.default_backend()} {name} bs={batch} remat={remat} "
          f"loss={loss} unroll={unroll} moe={moe} pd={patch_dropout} "
          f"aug={use_augment} accum={accum}")

    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    if loss == "siglip":
        params = add_siglip_params(params)
    opt = optax.adamw(1e-4, weight_decay=0.1)
    opt_state = opt.init(params)
    augment = None
    if use_augment:
        from tapclip_tpu.data.augment import AugmentConfig

        augment = AugmentConfig(scale=(0.9, 1.0), hflip=0.5)
    if accum > 1:
        step = make_accum_pretrain_step(cfg, opt, accum, loss=loss,
                                        augment=augment)
        batch *= accum  # macro batch; throughput counts macro samples
    else:
        step = make_pretrain_step(cfg, opt, loss=loss, augment=augment)
    needs_rng = patch_dropout > 0 or augment is not None

    gen = jax.jit(
        lambda k: (
            jax.random.normal(
                jax.random.fold_in(k, 0),
                (batch, cfg.image_size, cfg.image_size, 3),
                jnp.float32,
            ),
            jax.random.randint(
                jax.random.fold_in(k, 1), (batch, cfg.context_length), 0, 30000
            ),
        )
    )
    # Slope timing with a HARD drain (float(), a host readback): on the
    # tunneled backend, jax.block_until_ready on the loss of a chain of
    # donated-buffer steps has been observed to return early (0.4 ms/"step"
    # for a 200 ms step), so we time two chain lengths through float() and
    # difference them — constants (RTT, readback) cancel in the slope.
    n1, n2 = steps, 2 * steps
    batches = [gen(jax.random.PRNGKey(i)) for i in range(n2 + 1)]
    jax.block_until_ready(batches)

    rng0 = jax.random.PRNGKey(99)

    def call(params, opt_state, b, i):
        if needs_rng:
            return step(params, opt_state, *b, jax.random.fold_in(rng0, i))
        return step(params, opt_state, *b)

    # warm/compile (fold_in index must be non-negative: uint32 fold)
    params, opt_state, m = call(params, opt_state, batches[-1], n2 + 1)
    float(m["loss"])

    def run_chain(n):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, m = call(params, opt_state, batches[i], i)
        loss = float(m["loss"])
        return time.perf_counter() - t0, loss

    t1, _ = run_chain(n1)
    t2, loss = run_chain(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"pretrain step: {dt*1e3:.1f} ms -> {batch/dt:,.0f} img/s "
          f"(loss {loss:.4f}; chains {n1}/{n2}: {t1:.2f}s/{t2:.2f}s)")


if __name__ == "__main__":
    main()
