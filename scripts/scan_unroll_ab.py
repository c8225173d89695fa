"""Interleaved A/B: scan_unroll=1 (rolled) vs full unroll for the pretrain step.

scripts/scan_bwd_probe.py measured the fully-unrolled 12-layer vision
fwd+bwd ~7% faster than the rolled scan (113.4 vs 121.3 ms @bs=128) — the
scan's per-iteration carry save/restore disappears and XLA schedules across
layer boundaries.  This script checks whether that survives at the FULL
pretraining step (both towers + loss + AdamW), interleaved A-B-A-B in one
process (single-shot cross-process numbers are untrustworthy on this
tunnel, docs/PERF.md).

Protocol: one donated jitted dispatch per step, unique batch per dispatch
(relay-cache rule), hard float() drain, two chain lengths differenced
(slope timing).  Batches are regenerated per round to bound device memory.

Usage: python scripts/scan_unroll_ab.py [batch=128] [model=ViT-B-16] [steps=8]
                                        [remat=none|dots|full]
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
from tapclip_tpu.pretrain import make_pretrain_step


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    remat = sys.argv[4] if len(sys.argv) > 4 else "none"
    base = MODEL_PRESETS[name].replace(dtype="bfloat16", remat=remat)
    L = max(base.vision_layers, base.text_layers)
    variants = {"rolled": base, "unrolled": base.replace(scan_unroll=L)}
    print(f"backend={jax.default_backend()} {name} bs={batch} remat={remat} "
          f"(unroll {L} vs 1)")

    opt = optax.adamw(1e-4, weight_decay=0.1)
    state = {}
    steps_fn = {}
    for label, cfg in variants.items():
        params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
        state[label] = (params, opt.init(params))
        steps_fn[label] = make_pretrain_step(cfg, opt)

    def gen(k, cfg):
        return (
            jax.random.normal(
                jax.random.fold_in(k, 0),
                (batch, cfg.image_size, cfg.image_size, 3), jnp.float32,
            ),
            jax.random.randint(
                jax.random.fold_in(k, 1), (batch, cfg.context_length), 0, 30000
            ),
        )

    gen = jax.jit(gen, static_argnums=(1,))
    n1, n2 = steps, 2 * steps

    # compile both once (cold compiles can dominate; keep them out of rounds)
    for label in variants:
        b = gen(jax.random.PRNGKey(9999), base)
        p, s = state[label]
        p, s, m = steps_fn[label](p, s, *b)
        float(m["loss"])
        state[label] = (p, s)

    results = {k: [] for k in variants}
    for rnd, label in enumerate(["rolled", "unrolled", "rolled", "unrolled"]):
        batches = [
            gen(jax.random.PRNGKey(1 + rnd * 1000 + i), base)
            for i in range(n2 + n1)
        ]
        jax.block_until_ready(batches)
        p, s = state[label]
        stepf = steps_fn[label]

        def chain(n, off):
            nonlocal p, s
            t0 = time.perf_counter()
            for i in range(n):
                p, s, m = stepf(p, s, *batches[off + i])
            float(m["loss"])
            return time.perf_counter() - t0

        t1 = chain(n1, 0)
        t2 = chain(n2, n1)
        dt = (t2 - t1) / (n2 - n1)
        state[label] = (p, s)
        results[label].append(dt)
        print(f"round {rnd} {label:9s}: {dt*1e3:7.1f} ms/step "
              f"({batch/dt:,.0f} img/s)")
        del batches

    for label, ds in results.items():
        best = min(ds)
        print(f"{label:9s}: best {best*1e3:.1f} ms "
              f"({batch/best:,.0f} img/s) over {len(ds)} rounds")


if __name__ == "__main__":
    main()
