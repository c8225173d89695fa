"""Isolate grad-of-scan overhead: scan vs unrolled, dW vs dx-only.

The backward decomposition showed per-layer probes summing to ~8.1 ms/layer
while the in-scan fwd+bwd costs 10.9 ms/layer. Candidates for the gap: the
scan's stacked-residual traffic, the per-layer dW scatter into the stacked
[L, ...] gradient, or probe noise. Four timings at pretraining geometry:

  scan    fwd+bwd, grads wrt (blocks, x)
  scan    fwd+bwd, grads wrt x only      (no dW accumulation)
  unroll4 fwd+bwd, grads wrt (blocks, x) (lax.scan unroll=4)
  unroll12(full)   grads wrt (blocks, x)

Usage: python scripts/scan_bwd_probe.py [B=128] [steps=8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.config import MODEL_PRESETS
from tapclip_tpu.models import clip as C
import tapclip_tpu.models.layers as L

from scripts._bench_util import slope_time_args as slope


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = MODEL_PRESETS["ViT-B-16"].replace(dtype="bfloat16")
    W, Hh = cfg.vision_width, cfg.vision_heads
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    T = (n_tok + 7) // 8 * 8
    Ln = cfg.vision_layers
    print(f"backend={jax.default_backend()} B={B} T={T} W={W} L={Ln}")

    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    blocks = params["visual"]["blocks"]
    n = 3 * steps + 1
    xs = [
        jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
            jax.random.PRNGKey(i)
        )
        for i in range(n)
    ]
    jax.block_until_ready(xs)

    def scan_fn(bl, y, unroll):
        def stepf(c, lp):
            o, _ = L.block_forward(c, lp, Hh, act=cfg.act, kv_valid_len=n_tok)
            return o, None
        y, _ = jax.lax.scan(stepf, y, bl, unroll=unroll)
        return y

    for label, argnums, unroll in [
        ("scan    dW+dx", (0, 1), 1),
        ("scan    dx   ", (1,), 1),
        ("unroll4 dW+dx", (0, 1), 4),
        ("unroll12 dW+dx", (0, 1), Ln),
    ]:
        g = jax.jit(jax.grad(
            lambda bl, y, u=unroll: jnp.sum(
                scan_fn(bl, y, u).astype(jnp.float32)
            ),
            argnums=argnums,
        ))
        t = slope(g, [(blocks, x) for x in xs], steps)
        print(f"{label}: {t*1e3:8.2f} ms ({t/Ln*1e3:.2f}/layer)")


if __name__ == "__main__":
    main()
