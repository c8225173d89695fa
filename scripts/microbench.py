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


def timeit(fn, steps=10, warmup=2):
    """fn(i) -> array, where fn must give DISTINCT device inputs per i
    (pre-generated, cycled). Protocol for tunneled TPUs: exactly one jitted
    dispatch per timed step — no eager ops (~100 ms/step dispatch overhead),
    no host read-backs (~125 ms RTT), no repeated identical (exe, args)
    pairs (relay-level caching)."""
    for i in range(warmup):
        out = fn(i)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(warmup + i)
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
    N_VARIANTS = 6
    gen = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.image_size, cfg.image_size, 3), jnp.float32
        )
    )
    image_variants = [gen(jax.random.PRNGKey(100 + i)) for i in range(N_VARIANTS)]
    jax.block_until_ready(image_variants)
    images = image_variants[0]
    labels = jax.jit(lambda k: jax.random.randint(k, (batch,), 0, 5, jnp.int32))(key)
    mask = jnp.ones((batch,), bool)
    rng = np.random.default_rng(0)

    def img_variant(i):
        return image_variants[i % N_VARIANTS]

    img_fwd = jax.jit(lambda p, x: clip_model.encode_image(p, cfg, x))
    t = timeit(lambda i: img_fwd(params, img_variant(i)))
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
        ctx_variants = [
            trainable["ctx"] + 0.01 * (i + 1) for i in range(6)
        ]
        jax.block_until_ready(ctx_variants)
        t = timeit(lambda i: attr_fn(ctx_variants[i % 6], trainable["adjustor"]))
        print(f"text attr+encode [{impl:6s}]: {t*1e3:8.2f} ms")

    opt = make_optimizer(TrainConfig())
    step = make_train_step(cfg, pcfg, opt, use_image_feats=False)
    state = init_train_state(trainable, opt)

    def train_once(i):
        nonlocal state
        state, metrics = step(params, state, bank, img_variant(i), labels, mask)
        return metrics["loss"]

    t = timeit(train_once, steps=10)
    print(f"full train step      : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")

    estep = make_eval_step(cfg, pcfg, use_image_feats=False)
    t = timeit(
        lambda i: estep(params, trainable, bank, img_variant(i), labels, mask)["correct"],
        steps=10,
    )
    print(f"full eval step       : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")

    feat_variants = [
        clip_model.encode_image(params, cfg, image_variants[i % N_VARIANTS])
        for i in range(N_VARIANTS)
    ]
    jax.block_until_ready(feat_variants)
    step2 = make_train_step(cfg, pcfg, opt, use_image_feats=True)
    state2 = init_train_state(trainable, opt)

    def train_cached(i):
        nonlocal state2
        state2, metrics = step2(
            params, state2, bank, feat_variants[i % N_VARIANTS], labels, mask
        )
        return metrics["loss"]

    t = timeit(train_cached, steps=10)
    print(f"train step (cached)  : {t*1e3:8.2f} ms  ({batch/t:8.0f} img/s)")


if __name__ == "__main__":
    main()
