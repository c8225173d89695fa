"""LoRA fine-tuning tests (tapclip_tpu/peft.py).

Pins the merge-then-run formulation: zero-B adapters are an exact no-op,
gradients reach only (A, B), fine-tuning learns, and the merged tree runs
the unchanged tower stack (incl. MoE expert banks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.config import TINY_TEST
from tapclip_tpu.models import clip as C
from tapclip_tpu.peft import (
    init_lora_params,
    lora_param_count,
    make_lora_pretrain_step,
    merge_lora,
)


def _batch(rng, cfg, B=4):
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )
    return images, ids


def test_lora_init_shapes_and_size(tiny_params):
    lora = init_lora_params(jax.random.PRNGKey(0), tiny_params, rank=4)
    ab = lora["visual"]["blocks"]["attn"]["w_qkv"]
    L, W = tiny_params["visual"]["blocks"]["attn"]["w_qkv"].shape[:2]
    assert ab["a"].shape == (L, W, 4)
    assert ab["b"].shape == (L, 4, 3 * W)
    # non-adapted leaves carry no adapter
    assert lora["visual"]["proj"] is None
    assert lora["visual"]["blocks"]["ln_1"]["scale"] is None
    # a small fraction of the base parameter count
    base = sum(int(x.size) for x in jax.tree.leaves(tiny_params))
    assert 0 < lora_param_count(lora) < 0.2 * base


def test_zero_b_merge_is_identity(tiny_params, rng):
    cfg = TINY_TEST
    lora = init_lora_params(jax.random.PRNGKey(0), tiny_params, rank=4)
    merged = merge_lora(tiny_params, lora)
    images, _ = _batch(rng, cfg)
    f0 = C.encode_image(tiny_params, cfg, images)
    f1 = C.encode_image(merged, cfg, images)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)


def test_nonzero_b_changes_output(tiny_params, rng):
    cfg = TINY_TEST
    lora = init_lora_params(jax.random.PRNGKey(0), tiny_params, rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(tiny_params, lora)
    images, _ = _batch(rng, cfg)
    f0 = C.encode_image(tiny_params, cfg, images)
    f1 = C.encode_image(merged, cfg, images)
    assert float(jnp.max(jnp.abs(f0 - f1))) > 1e-4


def test_lora_finetune_learns_and_freezes_base(tiny_params, rng):
    cfg = TINY_TEST
    params = jax.tree.map(jnp.array, tiny_params)
    base_copy = jax.tree.map(np.asarray, params)
    lora = init_lora_params(jax.random.PRNGKey(0), params, rank=4)
    opt = optax.adam(1e-3)
    step = make_lora_pretrain_step(cfg, opt)
    opt_state = opt.init(lora)
    images, ids = _batch(rng, cfg)
    losses = []
    for _ in range(8):
        lora, opt_state, m = step(params, lora, opt_state, images, ids)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the base tree is untouched (frozen by construction)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        params,
        base_copy,
    )
    # B actually moved
    b = lora["visual"]["blocks"]["mlp"]["w_fc"]["b"]
    assert float(jnp.max(jnp.abs(b))) > 0.0


def test_lora_on_moe_towers(rng):
    cfg = TINY_TEST.replace(moe_experts=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    # expert banks adapt per-expert (leading E axis); the router is frozen
    ab = lora["visual"]["blocks"]["moe"]["w_fc"]
    L, E, W, H = params["visual"]["blocks"]["moe"]["w_fc"].shape
    assert ab["a"].shape == (L, E, W, 4)
    assert ab["b"].shape == (L, E, 4, H)
    assert lora["visual"]["blocks"]["moe"]["router"]["w"] is None

    opt = optax.adam(1e-3)
    step = make_lora_pretrain_step(cfg, opt)
    opt_state = opt.init(lora)
    images, ids = _batch(rng, cfg)
    lora, opt_state, m = step(params, lora, opt_state, images, ids)
    assert np.isfinite(float(m["loss"]))
