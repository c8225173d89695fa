"""Backward decomposition: per-block fwd+bwd cost vs the tower's.

Times jax.grad through one fused attention half-block, one fused MLP
half-block, the full image tower, and the text tower at pretraining
geometry — localizing where the step's backward time goes (the full step
measured 3.3x the loss forward at bs=128; ideal fwd+bwd is 3x fwd with
zero-cost recompute).

Usage: python scripts/bwd_profile.py [B=128] [model=ViT-B-16] [steps=5]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.config import MODEL_PRESETS
from tapclip_tpu.models import clip as C

from scripts._bench_util import slope_time_args as slope


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B-16"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = MODEL_PRESETS[name].replace(dtype="bfloat16")
    W, Hh = cfg.vision_width, cfg.vision_heads
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    T = (n_tok + 7) // 8 * 8
    Ln = cfg.vision_layers
    print(f"backend={jax.default_backend()} {name} B={B} T={T} W={W}")

    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    pv = params["visual"]
    blk = jax.tree.map(lambda a: a[0], pv["blocks"])
    n = 3 * steps + 1
    xs = [
        jax.jit(lambda k: jax.random.normal(k, (B, T, W), jnp.bfloat16))(
            jax.random.PRNGKey(i)
        )
        for i in range(n)
    ]
    jax.block_until_ready(xs)

    from tapclip_tpu.ops.fused_mha import fused_attn_block
    from tapclip_tpu.ops.fused_mlp import fused_mlp_block

    # fwd-only per layer
    attn_f = jax.jit(lambda p, y: fused_attn_block(y, p["ln_1"], p["attn"], Hh,
                                                   valid_len=n_tok))
    mlp_f = jax.jit(lambda p, y: fused_mlp_block(y, p["ln_2"], p["mlp"]))
    t_attn_f = slope(attn_f, [(blk, x) for x in xs], steps)
    t_mlp_f = slope(mlp_f, [(blk, x) for x in xs], steps)
    print(f"attn block fwd       : {t_attn_f*1e3:7.2f} ms/layer")
    print(f"mlp  block fwd       : {t_mlp_f*1e3:7.2f} ms/layer")

    # fwd+bwd per layer (grad wrt params AND input, like the real chain)
    attn_g = jax.jit(jax.grad(
        lambda p, y: jnp.sum(
            fused_attn_block(y, p["ln_1"], p["attn"], Hh, valid_len=n_tok)
            .astype(jnp.float32)
        ),
        argnums=(0, 1),
    ))
    mlp_g = jax.jit(jax.grad(
        lambda p, y: jnp.sum(
            fused_mlp_block(y, p["ln_2"], p["mlp"]).astype(jnp.float32)
        ),
        argnums=(0, 1),
    ))
    t_attn_g = slope(attn_g, [(blk, x) for x in xs], steps)
    t_mlp_g = slope(mlp_g, [(blk, x) for x in xs], steps)
    print(f"attn block fwd+bwd   : {t_attn_g*1e3:7.2f} ms/layer "
          f"({t_attn_g/t_attn_f:.2f}x fwd)")
    print(f"mlp  block fwd+bwd   : {t_mlp_g*1e3:7.2f} ms/layer "
          f"({t_mlp_g/t_mlp_f:.2f}x fwd)")

    # full towers fwd+bwd
    imgs = [
        jax.jit(lambda k: jax.random.normal(
            k, (B, cfg.image_size, cfg.image_size, 3), jnp.float32))(
            jax.random.PRNGKey(100 + i))
        for i in range(n)
    ]
    tower_g = jax.jit(jax.grad(
        lambda p, im: jnp.sum(C.encode_image(p, cfg, im).astype(jnp.float32))
    ))
    t_tower_g = slope(tower_g, [(params, im) for im in imgs], steps)
    print(f"image tower fwd+bwd  : {t_tower_g*1e3:7.2f} ms "
          f"(layers account {Ln*(t_attn_g+t_mlp_g)*1e3:.1f} ms; "
          f"embed/pool/glue {t_tower_g*1e3 - Ln*(t_attn_g+t_mlp_g)*1e3:+.1f} ms)")

    # 12-layer scan fwd and fwd+bwd (in-scan behavior differs from the
    # per-layer probes: scan-transpose activation stacking, dW accumulation)
    import tapclip_tpu.models.layers as L

    def scan_fn(blocks, y):
        def stepf(c, lp):
            o, _ = L.block_forward(c, lp, Hh, act=cfg.act, kv_valid_len=n_tok)
            return o, None
        y, _ = jax.lax.scan(stepf, y, blocks)
        return y

    scan_f = jax.jit(lambda bl, y: scan_fn(bl, y))
    scan_g = jax.jit(jax.grad(
        lambda bl, y: jnp.sum(scan_fn(bl, y).astype(jnp.float32)),
        argnums=(0, 1),
    ))
    t_scan_f = slope(scan_f, [(pv["blocks"], x) for x in xs], steps)
    t_scan_g = slope(scan_g, [(pv["blocks"], x) for x in xs], steps)
    print(f"12-layer scan fwd    : {t_scan_f*1e3:7.2f} ms ({t_scan_f/Ln*1e3:.2f}/layer)")
    print(f"12-layer scan fwd+bwd: {t_scan_g*1e3:7.2f} ms ({t_scan_g/t_scan_f:.2f}x fwd)")

    ids = [
        jax.jit(lambda k: jax.random.randint(k, (B, 77), 0, 30000))(
            jax.random.PRNGKey(200 + i))
        for i in range(n)
    ]
    txt_g = jax.jit(jax.grad(
        lambda p, t: jnp.sum(C.encode_text(p, cfg, t).astype(jnp.float32)),
        argnums=0,
    ))
    t_txt_g = slope(txt_g, [(params, t) for t in ids], steps)
    print(f"text tower fwd+bwd   : {t_txt_g*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
