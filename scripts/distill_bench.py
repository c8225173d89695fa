"""Distillation step throughput on the current backend (chip smoke + perf).

One jitted dispatch per timed step: frozen-teacher forward (both towers) +
student fwd/bwd + AdamW, with the KD objective (distill.py).  Same slope
protocol as pretrain_bench.py (donated student/opt trees, unique
(args, state) per dispatch, float() drain, two chain lengths differenced).

Usage: python scripts/distill_bench.py [batch=128] [student=ViT-B-32]
                                       [teacher=ViT-B-16] [steps=10]
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
from tapclip_tpu.distill import init_distill_params, make_distill_step
from tapclip_tpu.models import clip as C


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    s_name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-32"
    t_name = sys.argv[3] if len(sys.argv) > 3 else "ViT-B-16"
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    remat = sys.argv[5] if len(sys.argv) > 5 else "none"
    s_cfg = MODEL_PRESETS[s_name].replace(dtype="bfloat16", remat=remat)
    t_cfg = MODEL_PRESETS[t_name].replace(dtype="bfloat16")
    if s_cfg.image_size != t_cfg.image_size:
        raise SystemExit("teacher/student need matching image_size "
                         f"({t_cfg.image_size} vs {s_cfg.image_size})")
    print(f"backend={jax.default_backend()} student={s_name} "
          f"teacher={t_name} bs={batch} remat={remat}")

    student = init_distill_params(
        jax.random.PRNGKey(1),
        C.init_clip_params(jax.random.PRNGKey(0), s_cfg),
        s_cfg.embed_dim,
        t_cfg.embed_dim,
    )
    teacher = C.init_clip_params(jax.random.PRNGKey(2), t_cfg)
    opt = optax.adamw(1e-4, weight_decay=0.1)
    opt_state = opt.init(student)
    step = make_distill_step(s_cfg, t_cfg, opt)

    gen = jax.jit(
        lambda k: (
            jax.random.normal(
                jax.random.fold_in(k, 0),
                (batch, s_cfg.image_size, s_cfg.image_size, 3),
                jnp.float32,
            ),
            jax.random.randint(
                jax.random.fold_in(k, 1), (batch, s_cfg.context_length), 0, 30000
            ),
        )
    )
    n1, n2 = steps, 2 * steps
    batches = [gen(jax.random.PRNGKey(i)) for i in range(n2 + 1)]
    jax.block_until_ready(batches)

    student, opt_state, m = step(student, teacher, opt_state, *batches[-1])
    first = float(m["loss"])

    def run_chain(n):
        nonlocal student, opt_state
        t0 = time.perf_counter()
        for i in range(n):
            student, opt_state, m = step(student, teacher, opt_state, *batches[i])
        loss = float(m["loss"])
        return time.perf_counter() - t0, loss

    t1, _ = run_chain(n1)
    t2, loss = run_chain(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"distill step: {dt*1e3:.1f} ms -> {batch/dt:,.0f} img/s "
          f"(loss {first:.4f} -> {loss:.4f}; chains {n1}/{n2}: "
          f"{t1:.2f}s/{t2:.2f}s)")


if __name__ == "__main__":
    main()


