"""Component microbenchmarks on the current backend.

Times each piece of the fused prompt-tune step in isolation so optimization
effort targets the real bottleneck:
  * image tower fwd (pixels -> features)
  * text attribution pass (class-batched, pallas vs xla)
  * text encode pass
  * full train step / eval step

Usage: python scripts/microbench.py [ViT-B-16] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import MODEL_PRESETS, PromptConfig, TrainConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models.model_wrapper import (
    init_trainable,
    text_features_with_attribution,
)
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = MODEL_PRESETS[model_name].replace(dtype="bfloat16")
    pcfg = PromptConfig()
    print(f"backend={jax.default_backend()} model={model_name} batch={batch}")

    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    learner = PromptLearner(
        ["Backpack", "Alarm_Clock", "Laptop", "Pen", "Mug"],
        params, cfg, pcfg, get_tokenizer(context_length=cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, pcfg)
    bank = learner.bank
    key = jax.random.PRNGKey(0)
    images = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.image_size, cfg.image_size, 3), jnp.float32
        )
    )(key)
    labels = jax.jit(lambda k: jax.random.randint(k, (batch,), 0, 5, jnp.int32))(key)
    mask = jnp.ones((batch,), bool)
    rng = np.random.default_rng(0)

    img_fwd = jax.jit(lambda p, x: clip_model.encode_image(p, cfg, x))
    t = timeit(img_fwd, params, images)
    flops = 2 * batch * (
        cfg.vision_seq_len * cfg.vision_width * cfg.vision_width * 4 * 2  # attn proj
        + cfg.vision_seq_len * cfg.vision_width * cfg.vision_width * cfg.mlp_ratio * 2
        + 2 * cfg.vision_seq_len * cfg.vision_seq_len * cfg.vision_width
    ) * cfg.vision_layers
    print(f"image tower fwd      : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s, ~{flops/t/1e12:.1f} TF/s)")

    for impl in ["pallas", "xla"]:
        c2 = cfg.replace(attn_impl=impl)
        attr_fn = jax.jit(
            lambda ctx, adj: text_features_with_attribution(
                params, ctx, bank, c2, pcfg, adj
            )
        )
        t = timeit(attr_fn, trainable["ctx"], trainable["adjustor"])
        print(f"text attr+encode [{impl:6s}]: {t*1e3:8.2f} ms")

    ids = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (8, cfg.context_length)), jnp.int32)
    txt_fwd = jax.jit(lambda p, i: clip_model.encode_text(p, cfg, i))
    t = timeit(txt_fwd, params, ids)
    print(f"encode_text (B=8)    : {t*1e3:8.2f} ms")

    opt = make_optimizer(TrainConfig())
    step = make_train_step(cfg, pcfg, opt, use_image_feats=False)
    state = init_train_state(trainable, opt)
    t = timeit(lambda: step(params, state, bank, images, labels, mask)[1]["loss"], steps=10)
    print(f"full train step      : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")

    estep = make_eval_step(cfg, pcfg, use_image_feats=False)
    t = timeit(lambda: estep(params, trainable, bank, images, labels, mask)["correct"], steps=10)
    print(f"full eval step       : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")

    feats = clip_model.encode_image(params, cfg, images)
    step2 = make_train_step(cfg, pcfg, opt, use_image_feats=True)
    state2 = init_train_state(trainable, opt)
    t = timeit(lambda: step2(params, state2, bank, feats, labels, mask)[1]["loss"], steps=10)
    print(f"train step (cached)  : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")


if __name__ == "__main__":
    main()
