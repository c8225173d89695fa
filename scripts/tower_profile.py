"""Decompose the image-tower forward into kernel vs glue time (on TPU).

Measurement protocol (tunnel-validated, same as bench.py): K sequential
jitted dispatches chained by data dependence (output feeds the next input so
every (executable, args) pair is distinct), then ONE scalar readback that
drains the pipeline.  The readback RTT is measured separately and
subtracted.  Linearity in K is checked to confirm real execution time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.models import clip as C
from tapclip_tpu.models import layers as L

PEAK = 197e12  # v5e bf16 FLOPs/s


_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def drain(x):
    return float(_SUM(x))


def measure(fn, p, x0, steps):
    """Time `steps` chained dispatches of fn(p, x) -> x'; returns seconds/step."""
    x = x0
    for _ in range(2):  # warm + compile (drained)
        x = fn(p, x)
    drain(x)
    t0 = time.perf_counter()
    drain(x)
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        x = fn(p, x)
    drain(x)
    total = time.perf_counter() - t0
    return (total - rtt) / steps


def main():
    from tapclip_tpu.config import MODEL_PRESETS

    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
    cfg = MODEL_PRESETS[name].replace(dtype="bfloat16")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    W, H = cfg.vision_width, cfg.vision_heads
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    T = (n_tok + 7) // 8 * 8
    L_n = cfg.vision_layers
    print(f"backend={jax.default_backend()} {name} B={B} T={T} (valid {n_tok}) W={W} layers={L_n}")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    pv = params["visual"]
    blk0 = jax.tree.map(lambda a: a[0], pv["blocks"])

    x = jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    imgs = jax.jit(lambda k: jax.random.normal(
        k, (B, cfg.image_size, cfg.image_size, 3), jnp.float32))(
        jax.random.PRNGKey(2)
    )

    rows = B * T
    mlp_fl = 2 * rows * W * (cfg.mlp_ratio * W) * 2
    attn_fl = 2 * rows * W * 3 * W + 2 * rows * W * W + 4 * B * H * T * T * (W // H)
    layer_fl = mlp_fl + attn_fl

    # Full tower: chain by perturbing the image with the feature mean.
    tower = jax.jit(lambda p, im: C.encode_image(p, cfg, im))

    def tower_chained(p, im):
        f = tower(p, im)
        return im + (jnp.mean(f) * jnp.asarray(1e-6, im.dtype))

    t_full = measure(tower_chained, params, imgs, steps=8)
    patch_fl = 2 * B * (n_tok - 1) * (3 * cfg.patch_size ** 2) * W
    tower_fl = L_n * layer_fl + patch_fl
    print(f"encode_image        : {t_full*1e3:7.2f} ms  ({tower_fl/t_full/1e12:5.1f} TF/s, {tower_fl/t_full/PEAK*100:4.1f}% MXU)")

    # Linearity check: 16 steps should take ~2x of 8.
    t_full16 = measure(tower_chained, params, imgs, steps=16)
    print(f"  linearity check   : {t_full16*1e3:7.2f} ms/step at K=16 (should match)")

    # 12-layer scan only.
    @jax.jit
    def scan12(p, x):
        def step(c, lp):
            y, _ = L.block_forward(c, lp, H, act=cfg.act, kv_valid_len=n_tok)
            return y, None

        y, _ = jax.lax.scan(step, x, p["blocks"])
        return y

    t_scan = measure(scan12, pv, x, steps=8) / L_n
    print(f"scanned layer       : {t_scan*1e3:7.2f} ms/layer  ({layer_fl/t_scan/PEAK*100:4.1f}% MXU)")

    from tapclip_tpu.ops.fused_mha import fused_attn_block
    from tapclip_tpu.ops.fused_mlp import fused_mlp_block

    attn_j = jax.jit(
        lambda p, y: fused_attn_block(y, p["ln_1"], p["attn"], H, valid_len=n_tok)
    )
    t_attn = measure(attn_j, blk0, x, steps=24)
    print(f"fused_attn_block    : {t_attn*1e3:7.2f} ms/layer  (ideal {attn_fl/PEAK*1e3:4.2f}, {attn_fl/t_attn/PEAK*100:4.1f}% MXU)")

    mlp_j = jax.jit(lambda p, y: fused_mlp_block(y, p["ln_2"], p["mlp"]))
    t_mlp = measure(mlp_j, blk0, x, steps=24)
    print(f"fused_mlp_block     : {t_mlp*1e3:7.2f} ms/layer  (ideal {mlp_fl/PEAK*1e3:4.2f}, {mlp_fl/t_mlp/PEAK*100:4.1f}% MXU)")

    print(f"scan - (attn+mlp)   : {(t_scan - t_attn - t_mlp)*1e3:6.2f} ms/layer glue")
    print(f"tower - L*scanlayer : {(t_full - L_n*t_scan)*1e3:6.2f} ms embed/pool/glue")


if __name__ == "__main__":
    main()
