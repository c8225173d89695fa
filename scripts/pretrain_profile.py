"""Pretraining step decomposition: where does the MFU go?

Times, at each batch size / remat policy:
  * image-tower forward alone,
  * text-tower forward alone,
  * full loss forward (towers + contrastive),
  * the full train step (fwd + bwd + AdamW, donated buffers).

Slope timing through float() drains (tunnel protocol, see
scripts/pretrain_bench.py). FLOP model: ViT fwd ~= 2 * N_params_effective *
tokens; bwd ~= 2x fwd.

Usage: python scripts/pretrain_profile.py [model=ViT-B-16]
          [batches=128,256,512] [remat=none,dots,full] [steps=6]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tapclip_tpu.config import MODEL_PRESETS
from tapclip_tpu.models import clip as C
from tapclip_tpu.pretrain import make_pretrain_step


def slope_time(fn, inputs, steps):
    """fn(x) chained over distinct inputs; returns s/step via two-chain slope."""
    out = fn(inputs[-1])
    jax.tree.leaves(out)[0].block_until_ready()

    def chain(n, off):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(inputs[(off + i) % len(inputs)])
        jax.tree.leaves(o)[0].block_until_ready()
        return time.perf_counter() - t0

    t1 = chain(steps, 0)
    t2 = chain(2 * steps, steps % len(inputs))
    return (t2 - t1) / steps


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-16"
    batches = [int(b) for b in (sys.argv[2] if len(sys.argv) > 2 else "128,256,512").split(",")]
    remats = (sys.argv[3] if len(sys.argv) > 3 else "none,dots,full").split(",")
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    print(f"backend={jax.default_backend()} {name}")

    for B in batches:
        gen = jax.jit(
            lambda k: (
                jax.random.normal(jax.random.fold_in(k, 0), (B, 224, 224, 3), jnp.float32),
                jax.random.randint(jax.random.fold_in(k, 1), (B, 77), 0, 30000),
            )
        )
        data = [gen(jax.random.PRNGKey(i)) for i in range(2 * steps + 1)]
        jax.block_until_ready(data)

        for remat in remats:
            cfg = MODEL_PRESETS[name].replace(dtype="bfloat16", remat=remat)
            params = C.init_clip_params(jax.random.PRNGKey(0), cfg)

            img_fwd = jax.jit(lambda d, p=params: C.encode_image(p, cfg, d[0]))
            txt_fwd = jax.jit(lambda d, p=params: C.encode_text(p, cfg, d[1]))

            from tapclip_tpu.pretrain import contrastive_loss_local

            def loss(p, d):
                img = C.encode_image(p, cfg, d[0])
                txt = C.encode_text(p, cfg, d[1])
                return contrastive_loss_local(img, txt, p["logit_scale"])

            loss_fwd = jax.jit(lambda d, p=params: loss(p, d))

            t_img = slope_time(img_fwd, data, steps)
            t_txt = slope_time(txt_fwd, data, steps)
            t_fwd = slope_time(loss_fwd, data, steps)

            opt = optax.adamw(1e-4, weight_decay=0.1)
            pstate = [C.init_clip_params(jax.random.PRNGKey(0), cfg), None]
            pstate[1] = opt.init(pstate[0])
            step = make_pretrain_step(cfg, opt)

            def train_one(d):
                pstate[0], pstate[1], m = step(pstate[0], pstate[1], *d)
                return m["loss"]

            # donated-buffer chain -> drain through float() (tunnel protocol)
            float(train_one(data[-1]))

            def chain(n, off):
                t0 = time.perf_counter()
                l = None
                for i in range(n):
                    l = train_one(data[(off + i) % len(data)])
                lf = float(l)
                return time.perf_counter() - t0

            t1 = chain(steps, 0)
            t2 = chain(2 * steps, steps)
            t_step = (t2 - t1) / steps

            # FLOP model (MXU ops only), ViT-B/16-style towers:
            pv = cfg.vision_layers * 12 * cfg.vision_width ** 2
            Tv = (224 // cfg.patch_size) ** 2 + 1
            fl_img = 2 * B * (Tv * pv + Tv * Tv * cfg.vision_width * 2 * cfg.vision_layers
                              + Tv * 3 * 224 * 224 // Tv * cfg.vision_width)
            pt = cfg.text_layers * 12 * cfg.text_width ** 2
            fl_txt = 2 * B * 77 * (pt + 77 * cfg.text_width * 2 * cfg.text_layers)
            fl_step = 3 * (fl_img + fl_txt)
            tf = fl_step / t_step / 1e12
            print(f"bs={B:4d} remat={remat:5s} | img {t_img*1e3:7.1f} ms  "
                  f"txt {t_txt*1e3:6.1f} ms  fwd {t_fwd*1e3:7.1f} ms  "
                  f"step {t_step*1e3:7.1f} ms -> {B/t_step:7.1f} img/s "
                  f"(~{tf:.0f} TF/s eff)")


if __name__ == "__main__":
    main()
