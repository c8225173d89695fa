"""A/B the cached-feature train step: kernels-under-grad vs XLA text pass.

Round-1 measured 5.6 ms (XLA escape) vs 11.1 ms (kernels + recompute-VJP).
With the dedicated Pallas backward kernels the escape is deleted; this
script times both routings on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tapclip_tpu.config import MODEL_PRESETS, PromptConfig, TrainConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models.model_wrapper import init_trainable
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def time_impl(attn_impl: str, batch: int = 256, steps: int = 50) -> float:
    cfg = MODEL_PRESETS["ViT-B-16"].replace(dtype="bfloat16", attn_impl=attn_impl)
    pcfg = PromptConfig()
    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    learner = PromptLearner(
        ["Backpack", "Alarm_Clock", "Laptop", "Pen", "Mug"],
        params, cfg, pcfg, get_tokenizer(context_length=cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, pcfg)
    bank = learner.bank

    feats = jax.jit(
        lambda k: jax.random.normal(k, (batch, cfg.embed_dim), jnp.float32)
    )(jax.random.PRNGKey(7))
    labels = jax.jit(lambda k: jax.random.randint(k, (batch,), 0, 5, jnp.int32))(
        jax.random.PRNGKey(8)
    )
    mask = jnp.ones((batch,), bool)

    optimizer = make_optimizer(TrainConfig())
    step = make_train_step(cfg, pcfg, optimizer, use_image_feats=True)
    state = init_train_state(trainable, optimizer)

    state, m = step(params, state, bank, feats, labels, mask)
    jax.block_until_ready(m["loss"])
    state, m = step(params, state, bank, feats, labels, mask)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(params, state, bank, feats, labels, mask)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / steps * 1e3


if __name__ == "__main__":
    for impl in ("auto", "xla"):
        ms = time_impl(impl)
        print(f"cached train step attn_impl={impl}: {ms:.2f} ms")
