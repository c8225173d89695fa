"""int8 frozen-tower eval path: bounded accuracy delta vs f32.

CPU runs the deterministic round-to-nearest model (the kernel's stochastic
rounding needs the TPU PRNG; scripts/int8_smoke_tpu.py pins kernel-vs-model
proximity on the chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.ops.int8_mlp import (
    _xla_int8_reference,
    int8_mlp_block,
    quantize_cols_int8,
)


def test_quantize_cols_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    q, s = quantize_cols_int8(w)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # per-column max error bounded by half a quantization step
    err = jnp.max(jnp.abs(deq - w), axis=0)
    assert float(jnp.max(err / s[0])) <= 0.5 + 1e-5


def test_int8_mlp_close_to_f32(tiny_cfg, rng):
    from tapclip_tpu.models.layers import init_layer_norm, init_mlp, layer_norm, mlp_forward

    W, H = 128, 512
    x = jnp.asarray(rng.standard_normal((2, 8, W)), jnp.float32)
    ln = init_layer_norm(W)
    mlp = init_mlp(jax.random.PRNGKey(0), W, H)
    exact = x + mlp_forward(layer_norm(x, ln), mlp, "gelu")
    quant = int8_mlp_block(x, ln, mlp)
    # W8A8 on random gaussian weights: relative error in the few-percent range
    rel = float(
        jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact - x)
    )
    assert rel < 0.05, rel


def test_int8_attn_close_to_f32(rng):
    from tapclip_tpu.models.layers import init_attn, init_layer_norm
    from tapclip_tpu.ops.fused_mha import _attn_block_xla
    from tapclip_tpu.ops.int8_attn import int8_attn_block

    W, H = 128, 4
    x = jnp.asarray(rng.standard_normal((2, 16, W)), jnp.float32)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(0), W)
    exact = _attn_block_xla(
        x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
        attn["w_out"], attn["b_out"], H, 13, 1e-5,
    )
    quant = int8_attn_block(x, ln, attn, H, valid_len=13)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact - x))
    assert rel < 0.05, rel


def test_quantized_tower_feature_fidelity(tiny_cfg, tiny_params, rng):
    cfg_q = tiny_cfg.replace(quantize_tower=True)
    imgs = jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    f = C.l2_normalize(C.encode_image(tiny_params, tiny_cfg, imgs))
    q = C.l2_normalize(C.encode_image(tiny_params, cfg_q, imgs))
    cos = jnp.sum(f * q, axis=-1)
    assert float(jnp.min(cos)) > 0.99, np.asarray(cos)


def test_quantized_eval_accuracy_delta(tiny_cfg, tiny_params, tiny_prompt_cfg, tmp_path, rng):
    """End-to-end: synthetic color-separable task, int8 vs f32 eval accuracy."""
    from tapclip_tpu.data.imagefolder import get_dataloaders
    from tapclip_tpu.data.synthetic import build_imagefolder
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.utils.eval_metrics import evaluate_accuracy

    classes = ["Backpack", "Pen"]
    root = str(tmp_path / "imgs")
    build_imagefolder(root, classes, per_class=6, image_size=tiny_cfg.image_size)
    _, vl = get_dataloaders(
        root, classes, num_shots=0, verbose=False, image_size=tiny_cfg.image_size
    )
    batches = list(vl)

    accs = {}
    for name, cfg in [("f32", tiny_cfg), ("int8", tiny_cfg.replace(quantize_tower=True))]:
        model = FullModel(classes, tiny_params, cfg, prompt_cfg=tiny_prompt_cfg)
        correct = total = 0
        for images, labels, mask in batches:
            logits = np.asarray(model(images)["logits"])
            pred = logits.argmax(-1)
            correct += int(((pred == labels) & mask).sum())
            total += int(mask.sum())
        accs[name] = 100.0 * correct / total
    # Random tiny weights -> accuracy is near-chance either way; the check is
    # that quantization shifts it by a bounded amount, not that it is high.
    assert abs(accs["f32"] - accs["int8"]) <= 25.0, accs


def test_training_never_routes_to_int8(tiny_cfg, tiny_params, tiny_prompt_cfg):
    """The quantized tower has no VJP: differentiating through
    encode_image(quantize_tower=True) must raise, not silently train."""
    cfg_q = tiny_cfg.replace(quantize_tower=True)
    imgs = jnp.zeros((2, tiny_cfg.image_size, tiny_cfg.image_size, 3), jnp.float32)

    def loss(params):
        return jnp.sum(C.encode_image(params, cfg_q, imgs).astype(jnp.float32))

    # CPU routes to the differentiable XLA model, so grad succeeds there —
    # the real-chip guard is the missing pallas VJP. Either behavior is
    # acceptable as long as it does not crash the forward:
    out = C.encode_image(tiny_params, cfg_q, imgs)
    assert out.shape == (2, tiny_cfg.embed_dim)


def test_quantize_applies_under_token_pruning(tiny_cfg, tiny_params, rng):
    """Regression: the token-pruning tower path must honor quantize_tower
    (it used to drop it silently — the combined config ran pure bf16)."""
    imgs = jnp.asarray(
        rng.standard_normal((2, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    pruned = tiny_cfg.replace(token_keep_ratio=0.8, token_prune_layer=1)
    f_bf16 = C.encode_image(tiny_params, pruned, imgs)
    f_int8 = C.encode_image(tiny_params, pruned.replace(quantize_tower=True), imgs)
    diff = float(jnp.max(jnp.abs(f_int8 - f_bf16)))
    assert diff > 0, "quantize_tower was a silent no-op under token pruning"
    # ...but still a bounded perturbation
    cos = jnp.sum(C.l2_normalize(f_int8) * C.l2_normalize(f_bf16), -1)
    assert float(jnp.min(cos)) > 0.98


def test_quantize_attn_applies_off_fused_path(rng):
    """Regression: int8 attention projections must apply whether or not the
    fused-block kernel route is taken (CPU always takes the else-branch)."""
    from tapclip_tpu.models.layers import block_forward, init_attn, init_layer_norm, init_mlp

    W, H = 128, 4
    p = {
        "ln_1": init_layer_norm(W), "attn": init_attn(jax.random.PRNGKey(0), W),
        "ln_2": init_layer_norm(W), "mlp": init_mlp(jax.random.PRNGKey(1), W, 4 * W),
    }
    x = jnp.asarray(rng.standard_normal((2, 16, W)), jnp.float32)
    plain, _ = block_forward(x, p, H, act="gelu", quantize=False)
    quant, _ = block_forward(x, p, H, act="gelu", quantize=True)
    # int8 MLP alone would already differ; isolate the attention half-block:
    from tapclip_tpu.ops.fused_mha import _attn_block_xla
    from tapclip_tpu.ops.int8_attn import _xla_int8_attn_reference

    a_plain = _attn_block_xla(
        x, p["ln_1"]["scale"], p["ln_1"]["bias"], p["attn"]["w_qkv"],
        p["attn"]["b_qkv"], p["attn"]["w_out"], p["attn"]["b_out"], H, 16, 1e-5,
    )
    a_ref = _xla_int8_attn_reference(x, p["ln_1"], p["attn"], H, 16, 1e-5)
    assert float(jnp.max(jnp.abs(a_ref - a_plain))) > 0
    assert float(jnp.max(jnp.abs(quant - plain))) > 0


def test_deterministic_knob_routes_to_xla_model(rng):
    """deterministic=True must short-circuit BEFORE the Pallas path: here
    every kernel precondition holds and interpret=False, so if the flag
    were checked later the call would attempt a TPU kernel off-TPU and
    fail. Output must equal the round-to-nearest XLA model exactly."""
    from tapclip_tpu.models.layers import init_attn, init_layer_norm, init_mlp
    from tapclip_tpu.ops.int8_attn import _xla_int8_attn_reference, int8_attn_block

    W, H_mlp, heads = 128, 512, 4
    x = jnp.asarray(rng.standard_normal((4, 8, W)), jnp.float32)
    ln = init_layer_norm(W)
    mlp = init_mlp(jax.random.PRNGKey(0), W, H_mlp)
    out = int8_mlp_block(x, ln, mlp, interpret=False, deterministic=True)
    ref = _xla_int8_reference(x, ln, mlp, 1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    attn = init_attn(jax.random.PRNGKey(1), W)
    out_a = int8_attn_block(x, ln, attn, heads, interpret=False,
                            deterministic=True)
    ref_a = _xla_int8_attn_reference(x, ln, attn, heads, x.shape[1], 1e-5)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref_a))


def test_int8_deterministic_config_runs(tiny_cfg, tiny_params, rng):
    """CLIPConfig.int8_deterministic threads through the tower and is
    run-to-run reproducible."""
    cfg = tiny_cfg.replace(quantize_tower=True, int8_deterministic=True)
    imgs = jnp.asarray(
        rng.standard_normal((2, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    a = C.encode_image(tiny_params, cfg, imgs)
    b = C.encode_image(tiny_params, cfg, imgs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_tower_rejected_for_resnet(rng):
    """quantize_tower on a convolutional tower must fail loudly, not be a
    silent no-op (same failure class as the token-pruning drop)."""
    from tapclip_tpu.config import MODEL_PRESETS
    from tapclip_tpu.models.resnet import init_resnet_params

    cfg = MODEL_PRESETS["RN50"].replace(image_size=64, quantize_tower=True)
    params = {"visual": init_resnet_params(jax.random.PRNGKey(0), cfg)}
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="ViT towers only"):
        C.encode_image(params, cfg, imgs)


def test_pair_packed_core_matches_perhead_int8_dtype_mix(rng):
    """The shared packed attention core (fused_mha._pair_packed_attention,
    used by BOTH the bf16 block kernel and the int8 kernel) must match the
    per-head softmax-attention math under the int8 kernel's dtype mix:
    f32 q/k from the dequantized projections, compute-dtype (bf16) v.
    Chip A/B + kernel-output proximity: scripts/int8_pack_ab.py."""
    from tapclip_tpu.ops.fused_mha import _pair_packed_attention

    B, T, Dh, valid = 2, 24, 64, 19
    scale = Dh ** -0.5
    qg = jnp.asarray(rng.standard_normal((B, T, 2 * Dh)), jnp.float32)
    kg = jnp.asarray(rng.standard_normal((B, T, 2 * Dh)), jnp.float32)
    vg = jnp.asarray(rng.standard_normal((B, T, 2 * Dh)), jnp.bfloat16)

    packed = np.asarray(_pair_packed_attention(qg, kg, vg, valid=valid,
                                               scale=scale))

    mask = (np.arange(T) < valid)[None, None]
    outs = []
    for h in range(2):
        q = np.asarray(qg[:, :, h * Dh:(h + 1) * Dh], np.float64)
        k = np.asarray(kg[:, :, h * Dh:(h + 1) * Dh], np.float64)
        v = np.asarray(vg[:, :, h * Dh:(h + 1) * Dh], np.float64)
        s = np.where(mask, (q @ k.transpose(0, 2, 1)) * scale, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        outs.append((p / p.sum(-1, keepdims=True)) @ v)
    ref = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(packed, ref, rtol=2e-2, atol=2e-2)
