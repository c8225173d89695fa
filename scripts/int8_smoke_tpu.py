"""Real-chip smoke for the int8 MLP kernel (stochastic rounding path).

Checks: (1) the Pallas kernel runs at real shapes; (2) its output is close to
the deterministic round-to-nearest XLA model (stochastic rounding differs by
at most one quantization step per element); (3) unbiasedness — averaging many
stochastic evaluations approaches the f32 result; (4) end-to-end quantized
tower features stay close to f32.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import VIT_B_16
from tapclip_tpu.models import clip as C
from tapclip_tpu.models.layers import init_layer_norm, init_mlp, layer_norm, mlp_forward
from tapclip_tpu.ops.int8_mlp import _xla_int8_reference, int8_mlp_block


def main():
    assert jax.default_backend() == "tpu"
    W, H = 768, 3072
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 200, W), jnp.bfloat16)
    ln = init_layer_norm(W)
    mlp = init_mlp(jax.random.PRNGKey(1), W, H)

    kern = jax.jit(
        lambda ln, m, x, s: int8_mlp_block(x, ln, m, seed=s), static_argnums=3
    )
    det = jax.jit(lambda ln, m, x: _xla_int8_reference(x, ln, m, 1e-5))
    f32 = jax.jit(
        lambda ln, m, x: x + mlp_forward(layer_norm(x, ln), m, "gelu")
    )

    out_k = np.asarray(kern(ln, mlp, x, 0), np.float32)
    out_d = np.asarray(det(ln, mlp, x), np.float32)
    out_f = np.asarray(f32(ln, mlp, x), np.float32)
    resid = np.asarray(x, np.float32)

    def relerr(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b - resid))

    print(f"kernel vs deterministic-int8 model: rel {relerr(out_k, out_d):.4f}")
    print(f"kernel vs f32 exact              : rel {relerr(out_k, out_f):.4f}")
    assert relerr(out_k, out_d) < 0.05
    assert relerr(out_k, out_f) < 0.08

    # Unbiasedness of the ACTIVATION rounding: averaging over seeds should
    # approach the weights-quantized/activations-exact target (the weight
    # rounding bias is fixed and does not average out).
    from tapclip_tpu.ops.int8_mlp import quantize_cols_int8

    wfc_q, sfc = quantize_cols_int8(mlp["w_fc"])
    wpj_q, spj = quantize_cols_int8(mlp["w_proj"])
    mlp_wq = dict(
        mlp,
        w_fc=wfc_q.astype(jnp.float32) * sfc,
        w_proj=wpj_q.astype(jnp.float32) * spj,
    )
    out_wq = np.asarray(f32(ln, mlp_wq, x), np.float32)
    outs = [np.asarray(kern(ln, mlp, x, s), np.float32) for s in range(8)]
    spread = relerr(outs[0], outs[1])
    one, many = relerr(outs[0], out_wq), relerr(np.mean(outs, axis=0), out_wq)
    print(f"seed-to-seed spread rel {spread:.4f}; single draw vs w-quant target "
          f"rel {one:.4f} -> 8-seed mean rel {many:.4f}")
    assert spread > 0, "stochastic rounding produced identical draws across seeds"
    assert many < one, (many, one)

    # int8 attention half-block kernel vs its deterministic model and f32.
    from tapclip_tpu.models.layers import init_attn
    from tapclip_tpu.ops.fused_mha import _attn_block_xla
    from tapclip_tpu.ops.int8_attn import _xla_int8_attn_reference, int8_attn_block

    Ha = 12
    attn = init_attn(jax.random.PRNGKey(7), W)
    akern = jax.jit(
        lambda ln, a, x, s: int8_attn_block(x, ln, a, Ha, valid_len=197, seed=s),
        static_argnums=3,
    )
    adet = jax.jit(
        lambda ln, a, x: _xla_int8_attn_reference(x, ln, a, Ha, 197, 1e-5)
    )
    af32 = jax.jit(
        lambda ln, a, x: _attn_block_xla(
            x, ln["scale"], ln["bias"], a["w_qkv"], a["b_qkv"],
            a["w_out"], a["b_out"], Ha, 197, 1e-5,
        )
    )
    aout_k = np.asarray(akern(ln, attn, x, 0), np.float32)
    aout_d = np.asarray(adet(ln, attn, x), np.float32)
    aout_f = np.asarray(af32(ln, attn, x), np.float32)
    print(f"attn kernel vs deterministic-int8 model: rel {relerr(aout_k, aout_d):.4f}")
    print(f"attn kernel vs f32 exact               : rel {relerr(aout_k, aout_f):.4f}")
    assert relerr(aout_k, aout_d) < 0.05
    assert relerr(aout_k, aout_f) < 0.08

    # End-to-end quantized tower.
    cfg = VIT_B_16.replace(dtype="bfloat16")
    cfg_q = cfg.replace(quantize_tower=True)
    params = C.init_clip_params(jax.random.PRNGKey(2), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (16, 224, 224, 3), jnp.float32)
    ef = jax.jit(lambda p, im: C.l2_normalize(C.encode_image(p, cfg, im)))
    eq = jax.jit(lambda p, im: C.l2_normalize(C.encode_image(p, cfg_q, im)))
    f = np.asarray(ef(params, imgs), np.float32)
    q = np.asarray(eq(params, imgs), np.float32)
    cos = (f * q).sum(-1)
    print(f"quantized ViT-B/16 feature cosine vs f32: min {cos.min():.4f}")
    assert cos.min() > 0.98, cos.min()
    print("INT8 SMOKE PASSED on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
