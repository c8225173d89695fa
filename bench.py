"""Benchmark: ViT-B/16 prompt-tune throughput (fwd+attribution+bwd+update).

The BASELINE.json north-star metric: CLIP ViT-B/16 prompt tuning at
>= 2000 images/sec/chip (forward + attribution) on TPU.  This benchmark runs
the FULL fused training step — image tower on pixels, class-batched
attribution pass, adjusted text pass, backward into the context bank, AdamW —
and reports steady-state images/sec on the available chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
(vs_baseline = value / 2000, the north-star target.)

Env overrides: BENCH_MODEL (ViT-B-16), BENCH_BATCH (256), BENCH_STEPS (20),
BENCH_DTYPE (bfloat16), BENCH_MODE (train|eval).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _probe_backend(timeout_s: float):
    """Check that jax can initialize its backend within ``timeout_s``.

    The sandbox reaches its TPU through a tunnel that, when down, makes
    ``jax.devices()`` hang indefinitely (observed: >10 min with no error).
    Probing in a subprocess bounds that failure so the bench emits an honest
    JSON error line instead of hanging the driver.  Returns the backend name
    on success, None on timeout/failure.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    lines = r.stdout.strip().splitlines()
    return lines[-1] if lines else None


def main():
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))
    if probe_timeout > 0:
        probed = _probe_backend(probe_timeout)
        if probed is None:
            print(
                f"[bench] backend init probe failed within {probe_timeout:.0f}s "
                "(TPU tunnel down?)",
                file=sys.stderr,
            )
            print(
                json.dumps(
                    {
                        "metric": "CLIP ViT-B-16 prompt-tune images/sec/chip "
                        "(fwd+attribution+bwd)",
                        "value": 0.0,
                        "unit": "images/sec/chip",
                        "vs_baseline": 0.0,
                        "extra": {
                            "error": "backend unavailable: jax init did not "
                            f"complete within {probe_timeout:.0f}s"
                        },
                    }
                )
            )
            return
        print(f"[bench] backend probe ok: {probed}", file=sys.stderr)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tapclip_tpu.config import MODEL_PRESETS, PromptConfig, TrainConfig
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import init_trainable
    from tapclip_tpu.models.prompt_learner import PromptLearner
    from tapclip_tpu.parallel.train_step import (
        init_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    model_name = os.environ.get("BENCH_MODEL", "ViT-B-16")
    # Throughput rises with batch: 3774 (256) -> 3875 (512) -> 3964 (1024) ->
    # 4013 img/s (2048), all past the 2k target; 2048 is the default.
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    mode = os.environ.get("BENCH_MODE", "train")
    attn_impl = os.environ.get("BENCH_ATTN_IMPL", "auto")
    keep_ratio = float(os.environ.get("BENCH_KEEP_RATIO", "1.0"))
    quantize = os.environ.get("BENCH_QUANT", "0") == "1"  # int8 frozen tower
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))  # block-scan unroll

    backend = jax.default_backend()
    if backend != "tpu":
        print(f"[bench] WARNING: running on {backend}, not tpu", file=sys.stderr)
        if os.environ.get("BENCH_BATCH") is None:
            batch = 16
        if os.environ.get("BENCH_STEPS") is None:
            steps = 5

    # int8 tower is valid in BOTH modes here: prompt-tune training never
    # differentiates the frozen image tower (grads flow only to the prompt
    # side), so the VJP-less int8 ops are off the autodiff path.
    cfg = MODEL_PRESETS[model_name].replace(
        dtype=dtype, attn_impl=attn_impl, token_keep_ratio=keep_ratio,
        quantize_tower=quantize, scan_unroll=unroll,
    )
    pcfg = PromptConfig()
    print(f"[bench] {model_name} {dtype} batch={batch} steps={steps} mode={mode} "
          f"backend={backend}", file=sys.stderr)

    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    learner = PromptLearner(
        ["Backpack", "Alarm_Clock", "Laptop", "Pen", "Mug"],
        params,
        cfg,
        pcfg,
        get_tokenizer(context_length=cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, pcfg)
    bank = learner.bank

    # Generate the batch on device (host->device transfer of a 224px batch
    # over a tunneled link costs minutes; RNG on the chip is instant).
    key = jax.random.PRNGKey(0)
    images = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.image_size, cfg.image_size, 3), jnp.float32
        )
    )(key)
    labels = jax.jit(
        lambda k: jax.random.randint(k, (batch,), 0, 5, jnp.int32)
    )(key)
    mask = jnp.ones((batch,), bool)

    optimizer = make_optimizer(TrainConfig())
    # Measurement protocol notes (tunneled-TPU hazards, measured here):
    #  * Per-step host read-backs cost a full RTT (~125 ms) — never in the
    #    timed loop.
    #  * Per-step EAGER ops (even tiny scalar math) add ~100 ms/step of
    #    dispatch overhead — the timed loop must dispatch exactly one jitted
    #    call per step.
    #  * Identical (executable, args) executions can be cached by the relay —
    #    train mode is naturally safe (the optimizer state differs every
    #    step); eval mode pre-generates one distinct batch PER timed step
    #    (plus two warmup-only batches), so no (executable, args) pair ever
    #    repeats.
    if mode == "train":
        step = make_train_step(cfg, pcfg, optimizer, use_image_feats=False)
        state = init_train_state(trainable, optimizer)

        def run(i):
            nonlocal state
            state, metrics = step(params, state, bank, images, labels, mask)
            return metrics["loss"]

    else:
        estep = make_eval_step(cfg, pcfg, use_image_feats=False)
        # Relay-cache rule: every timed step must execute a NEVER-seen
        # (executable, args) pair, so one distinct batch per timed step plus
        # two warmup-only batches.  uint8 storage (the production input
        # dtype; device_normalize fuses into the tower bit-identically)
        # keeps steps+2 variants within HBM at 4x less memory than f32.
        n_variants = steps + 2
        est_gb = n_variants * batch * cfg.image_size ** 2 * 3 / 2 ** 30
        if est_gb > 10:
            steps = max(4, int(10 * 2 ** 30 / (batch * cfg.image_size ** 2 * 3)) - 2)
            n_variants = steps + 2
            print(f"[bench] capping eval steps to {steps} "
                  f"({est_gb:.1f} GiB of variants would exceed HBM)", file=sys.stderr)
        gen = jax.jit(
            lambda k: jax.random.randint(
                k, (batch, cfg.image_size, cfg.image_size, 3), 0, 256, jnp.uint8
            )
        )
        variants = [gen(jax.random.PRNGKey(100 + i)) for i in range(n_variants)]
        jax.block_until_ready(variants)

        def run(i):
            # Warmup uses i=0,1; timed steps use variants[2:] exactly once.
            return estep(params, trainable, bank, variants[i], labels, mask)[
                "correct"
            ]

    # Warmup / compile.
    t0 = time.perf_counter()
    out = run(0)
    jax.block_until_ready(out)
    print(f"[bench] compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    jax.block_until_ready(run(1))

    t0 = time.perf_counter()
    for i in range(steps):
        out = run(i if mode == "train" else i + 2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * steps / dt
    print(f"[bench] {dt/steps*1e3:.2f} ms/step", file=sys.stderr)

    # Secondary evidence in the same artifact: the cached-feature train step
    # (the rate real prompt-tuning epochs run at — the frozen tower is
    # encoded once per dataset) — cheap to measure here.
    extra = {"ms_per_step": round(dt / steps * 1e3, 2), "batch": batch,
             "mode": mode, "model": model_name}
    if mode == "train" and os.environ.get("BENCH_SKIP_CACHED") != "1":
        feats = clip_model.encode_image(params, cfg, images)
        jax.block_until_ready(feats)
        cstep = make_train_step(cfg, pcfg, optimizer, use_image_feats=True)
        cstate = init_train_state(trainable, optimizer)
        cstate, m = cstep(params, cstate, bank, feats, labels, mask)
        jax.block_until_ready(m["loss"])
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            cstate, m = cstep(params, cstate, bank, feats, labels, mask)
        jax.block_until_ready(m["loss"])
        cdt = (time.perf_counter() - t0) / n
        extra["cached_train_step_ms"] = round(cdt * 1e3, 3)
        extra["cached_imgs_per_sec"] = round(batch / cdt, 1)
        print(f"[bench] cached-feature step: {cdt*1e3:.2f} ms", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": (
                    f"CLIP {model_name} "
                    + ("prompt-tune images/sec/chip (fwd+attribution+bwd)"
                       if mode == "train"
                       else "eval images/sec/chip (fwd+attribution)")
                    + (f" [token_keep={keep_ratio}]" if keep_ratio < 1.0 else "")
                    + (" [int8 tower]" if cfg.quantize_tower else "")
                ),
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / 2000.0, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
