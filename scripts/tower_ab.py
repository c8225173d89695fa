"""A/B microbenchmarks for image-tower variants (run on TPU).

Times isolated ViT-B/16 forward variants to decide which optimizations to
adopt in the library. Variants:
  base        — current encode_image
  no_transpose— attention einsum directly on [B,T,H,Dh] (no transpose ops)
  gelu_tanh   — approximate gelu
  bf16_pixels — feed bf16 pixels
  conv_patch  — lax.conv for patch embed instead of reshape+matmul
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.config import VIT_B_16
from tapclip_tpu.models import clip as C
from tapclip_tpu.models import layers as L


def timeit(fn, params, imgs, steps=20):
    """Device-side loop timing: N data-chained invocations inside ONE jitted
    fori_loop — a single dispatch, so tunnel latency and host overhead are
    amortized to zero and nothing can be cached or overlapped away."""

    @jax.jit
    def loop(p, x):
        def body(i, carry):
            out = fn(p, carry)
            # feed the output back into the next input: true serialization
            return carry + (out.mean() * 1e-3 + 1e-2).astype(carry.dtype)

        return jax.lax.fori_loop(0, steps, body, x)

    jax.block_until_ready(loop(params, imgs))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(loop(params, imgs))
    t1 = time.perf_counter()
    return (t1 - t0) / steps


def attn_no_transpose(x, p, n_heads):
    B, T, W = x.shape
    dtype = x.dtype
    qkv = jnp.dot(x, p["w_qkv"].astype(dtype), preferred_element_type=jnp.float32)
    qkv = (qkv + p["b_qkv"].astype(jnp.float32)).astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    Dh = W // n_heads
    q = q.reshape(B, T, n_heads, Dh)
    k = k.reshape(B, T, n_heads, Dh)
    v = v.reshape(B, T, n_heads, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(s * (Dh ** -0.5), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                   preferred_element_type=jnp.float32).astype(dtype)
    o = o.reshape(B, T, W)
    y = jnp.dot(o, p["w_out"].astype(dtype), preferred_element_type=jnp.float32)
    return (y + p["b_out"].astype(jnp.float32)).astype(dtype)


def make_tower(cfg, variant):
    act = "gelu"
    use_nt = variant == "no_transpose"
    if variant == "gelu_tanh":
        act = "gelu_tanh"

    def block(x, p):
        h = (
            attn_no_transpose(L.layer_norm(x, p["ln_1"]), p["attn"], cfg.vision_heads)
            if use_nt
            else L.attn_forward(
                L.layer_norm(x, p["ln_1"]), p["attn"], cfg.vision_heads, impl="xla"
            )[0]
        )
        x = x + h
        if act == "gelu_tanh":
            d = x.dtype
            hh = jnp.dot(L.layer_norm(x, p["ln_2"]), p["mlp"]["w_fc"].astype(d),
                         preferred_element_type=jnp.float32)
            hh = (hh + p["mlp"]["b_fc"]).astype(d)
            hh = jax.nn.gelu(hh, approximate=True)
            y = jnp.dot(hh, p["mlp"]["w_proj"].astype(d), preferred_element_type=jnp.float32)
            x = x + (y + p["mlp"]["b_proj"]).astype(d)
        else:
            x = x + L.mlp_forward(L.layer_norm(x, p["ln_2"]), p["mlp"], "gelu")
        return x

    def tower(params, images):
        p = params["visual"]
        dtype = jnp.bfloat16
        if variant == "conv_patch":
            w = p["patch_embed"]["w"].astype(dtype).reshape(
                cfg.patch_size, cfg.patch_size, 3, cfg.vision_width
            )
            x = jax.lax.conv_general_dilated(
                images.astype(dtype), w,
                window_strides=(cfg.patch_size, cfg.patch_size),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            x = x.reshape(x.shape[0], -1, cfg.vision_width)
        else:
            x = C.patchify(images.astype(dtype), cfg.patch_size)
            x = jnp.dot(x, p["patch_embed"]["w"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["positional_embedding"].astype(dtype)[None]
        x = L.layer_norm(x, p["ln_pre"])

        def scan_step(carry, lp):
            return block(carry, lp), None

        x, _ = jax.lax.scan(scan_step, x, p["blocks"])
        x = L.layer_norm(x, p["ln_post"])
        return jnp.dot(x[:, 0], p["proj"].astype(dtype), preferred_element_type=jnp.float32)

    return jax.jit(tower)


def main():
    cfg = VIT_B_16.replace(dtype="bfloat16")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print("backend:", jax.default_backend(), "batch:", B)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    images = jax.jit(lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.float32))(
        jax.random.PRNGKey(1)
    )
    base = None
    for variant in ["base", "no_transpose", "gelu_tanh", "conv_patch", "bf16_pixels"]:
        imgs = images.astype(jnp.bfloat16) if variant == "bf16_pixels" else images
        tower = make_tower(cfg, "base" if variant == "bf16_pixels" else variant)
        t = timeit(tower, params, imgs)
        if base is None:
            base = t
        print(f"{variant:13s}: {t*1e3:7.2f} ms ({B/t:7.0f} img/s)  {base/t:5.2f}x")


if __name__ == "__main__":
    main()
