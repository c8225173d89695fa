"""Pretraining FORWARD decomposition: image tower vs text tower vs loss glue.

Times, per batch size: image-tower forward, text-tower forward, and the full
contrastive loss forward. Pair with scripts/pretrain_bench.py (run per
(batch, remat) in its own process — full-step state is memory-heavy) to
decompose step time = fwd + bwd + update.

Slope timing with fully-unique inputs per dispatch (3*steps+1 distinct
batches): forward-only executables with unchanging params are exactly the
(executable, args)-repeat case the tunnel relay caches.

Usage: python scripts/pretrain_profile.py [model=ViT-B-16] [batches=128,256]
          [steps=5]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.config import MODEL_PRESETS
from tapclip_tpu.models import clip as C
from tapclip_tpu.pretrain import contrastive_loss_local


from scripts._bench_util import slope_time


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-16"
    batches = [int(b) for b in (sys.argv[2] if len(sys.argv) > 2 else "128,256").split(",")]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = MODEL_PRESETS[name].replace(dtype="bfloat16")
    print(f"backend={jax.default_backend()} {name}")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)

    img_fwd = jax.jit(lambda p, d: C.encode_image(p, cfg, d[0]))
    txt_fwd = jax.jit(lambda p, d: C.encode_text(p, cfg, d[1]))

    def loss(p, d):
        img = C.encode_image(p, cfg, d[0])
        txt = C.encode_text(p, cfg, d[1])
        return contrastive_loss_local(img, txt, p["logit_scale"])

    loss_fwd = jax.jit(loss)

    for B in batches:
        gen = jax.jit(
            lambda k: (
                jax.random.normal(jax.random.fold_in(k, 0), (B, 224, 224, 3), jnp.float32),
                jax.random.randint(jax.random.fold_in(k, 1), (B, 77), 0, 30000),
            )
        )
        n_needed = 3 * steps + 1
        data = [gen(jax.random.PRNGKey(i)) for i in range(n_needed)]
        jax.block_until_ready(data)

        t_img = slope_time(img_fwd, params, data, steps)
        data = [gen(jax.random.PRNGKey(1000 + i)) for i in range(n_needed)]
        t_txt = slope_time(txt_fwd, params, data, steps)
        data = [gen(jax.random.PRNGKey(2000 + i)) for i in range(n_needed)]
        t_fwd = slope_time(loss_fwd, params, data, steps)
        del data

        glue = t_fwd - t_img - t_txt
        print(f"bs={B:4d} | img fwd {t_img*1e3:7.1f} ms ({B/t_img:7.1f} img/s)  "
              f"txt fwd {t_txt*1e3:6.1f} ms  loss fwd {t_fwd*1e3:7.1f} ms  "
              f"(glue {glue*1e3:+6.1f} ms)")


if __name__ == "__main__":
    main()
