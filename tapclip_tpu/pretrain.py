"""CLIP contrastive pretraining / fine-tuning step (bidirectional InfoNCE).

The reference sketches the bidirectional CLIP loss in a comment and never
implements it (``/root/reference/models/model_wrapper.py:94-99``).  Here it
is a first-class, TPU-native training step:

* loss: symmetric cross-entropy over ``logit_scale * img @ txt.T`` — the
  standard CLIP objective;
* **global-batch negatives across chips**: under a data-sharded mesh the
  features are all-gathered over the ``data`` axis inside ``shard_map`` so
  every chip contrasts its local positives against the full global batch —
  the collective rides ICI (SURVEY.md §2.2 rebuild obligation), matching
  open_clip's ``gather_features`` semantics with ``local_loss=False``;
* the backward through the all_gather is handled by JAX (reduce-scatter).

This trains the towers themselves (unlike prompt tuning, which freezes
them), so it is the path for from-scratch or continued CLIP training.

Also provides the SigLIP pairwise sigmoid objective (Zhai et al. 2023),
whose sharded form is a ``ppermute`` ring over the ``data`` axis — no
logit all-gather, O(B_local^2) logit memory per chip at any global batch.
"""

from __future__ import annotations

from typing import Callable, Optional

import functools
import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.parallel.mesh import DATA_AXIS


def contrastive_loss_local(
    img_feats: jnp.ndarray, txt_feats: jnp.ndarray, logit_scale: jnp.ndarray
) -> jnp.ndarray:
    """Single-device bidirectional InfoNCE (the reference's commented sketch)."""
    img = clip_model.l2_normalize(img_feats).astype(jnp.float32)
    txt = clip_model.l2_normalize(txt_feats).astype(jnp.float32)
    logits = jnp.exp(logit_scale) * img @ txt.T  # [B, B]
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def contrastive_loss_global(
    img_feats: jnp.ndarray,
    txt_feats: jnp.ndarray,
    logit_scale: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Global-batch InfoNCE over a data-sharded mesh.

    Inputs are the per-chip local shards ``[B_local, E]``; features are
    all-gathered along ``data`` so negatives span the global batch.  The
    returned loss is the global mean (identical to computing the whole thing
    on one device — asserted in tests on the virtual 8-device mesh).
    """

    def per_chip(img_local, txt_local, scale):
        img = clip_model.l2_normalize(img_local).astype(jnp.float32)
        txt = clip_model.l2_normalize(txt_local).astype(jnp.float32)
        img_all = jax.lax.all_gather(img, DATA_AXIS, axis=0, tiled=True)
        txt_all = jax.lax.all_gather(txt, DATA_AXIS, axis=0, tiled=True)
        n_local = img.shape[0]
        offset = jax.lax.axis_index(DATA_AXIS) * n_local
        labels = offset + jnp.arange(n_local)

        s = jnp.exp(scale)
        # image->text: local images vs ALL texts
        logits_i = s * img @ txt_all.T  # [B_local, B_global]
        li = optax.softmax_cross_entropy_with_integer_labels(logits_i, labels)
        # text->image: local texts vs ALL images
        logits_t = s * txt @ img_all.T
        lt = optax.softmax_cross_entropy_with_integer_labels(logits_t, labels)
        loss_sum = (0.5 * (li + lt)).sum()
        total = jax.lax.psum(loss_sum, DATA_AXIS)
        n_global = jax.lax.psum(jnp.asarray(n_local, jnp.float32), DATA_AXIS)
        return total / n_global

    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(img_feats, txt_feats, logit_scale)


def siglip_loss_local(
    img_feats: jnp.ndarray,
    txt_feats: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Single-device SigLIP pairwise sigmoid loss (Zhai et al. 2023).

    Every (image, text) pair is an independent binary problem:
    ``-1/B * sum_ij log sigmoid(z_ij * (t * img_i . txt_j + b))`` with
    ``z = +1`` on the diagonal and ``-1`` off it.  No softmax row coupling,
    so the sharded form below needs no logit all-gather.
    """
    img = clip_model.l2_normalize(img_feats).astype(jnp.float32)
    txt = clip_model.l2_normalize(txt_feats).astype(jnp.float32)
    n = img.shape[0]
    logits = jnp.exp(logit_scale) * img @ txt.T + logit_bias
    z = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0
    return -jnp.sum(jax.nn.log_sigmoid(z * logits)) / n


def siglip_loss_global(
    img_feats: jnp.ndarray,
    txt_feats: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Global-batch SigLIP loss via a ppermute ring (the paper's "chunked"
    implementation, TPU-native): instead of all-gathering features, each
    chip keeps its image shard resident and the text shards rotate around
    the ``data`` axis ring — D-1 ``ppermute`` steps, each overlapping a
    [B_local, B_local] logit block.  Peak memory is one text shard + one
    local logit block per chip regardless of global batch; every pair is
    visited exactly once (positives only on the un-rotated step), so the
    result equals the single-device loss on the gathered batch (asserted
    in tests/test_siglip.py, values and gradients)."""
    n_dev = mesh.shape[DATA_AXIS]
    ring = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_chip(img_local, txt_local, scale, bias):
        img = clip_model.l2_normalize(img_local).astype(jnp.float32)
        txt = clip_model.l2_normalize(txt_local).astype(jnp.float32)
        n_local = img.shape[0]
        s = jnp.exp(scale)

        def block_loss(txt_chunk, z):
            logits = s * img @ txt_chunk.T + bias
            return -jnp.sum(jax.nn.log_sigmoid(z * logits))

        # step 0: own chunk — positives on the diagonal
        z0 = 2.0 * jnp.eye(n_local, dtype=jnp.float32) - 1.0
        loss0 = block_loss(txt, z0)

        def body(carry, _):
            txt_c, acc = carry
            txt_c = jax.lax.ppermute(txt_c, DATA_AXIS, ring)
            acc = acc + block_loss(txt_c, jnp.float32(-1.0))
            return (txt_c, acc), None

        (_, loss_sum), _ = jax.lax.scan(
            body, (txt, loss0), None, length=n_dev - 1
        )
        total = jax.lax.psum(loss_sum, DATA_AXIS)
        n_global = jax.lax.psum(jnp.asarray(n_local, jnp.float32), DATA_AXIS)
        return total / n_global

    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(img_feats, txt_feats, logit_scale, logit_bias)


def add_siglip_params(params: dict, init_bias: float = -10.0) -> dict:
    """Return a copy of ``params`` with the SigLIP ``logit_bias`` added
    (paper init: b' = -10, so training starts near the all-negatives
    prior).  A pre-existing bias is preserved (checkpoint resume)."""
    if "logit_bias" in params:
        return dict(params)
    return dict(params, logit_bias=jnp.asarray(init_bias, jnp.float32))


def make_pretrain_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss: str = "infonce",
    pp_microbatches: int = 0,
    seq_parallel: bool = False,
    fsdp: bool = False,
    augment=None,
    lock_image: bool = False,
    lock_text: bool = False,
) -> Callable:
    """Jitted CLIP pretraining step over (images, token_ids).

    Trains the full param tree (towers + projections + logit_scale).  With a
    mesh, the contrastive negatives span the global batch via ICI
    collectives (all_gather for InfoNCE, a ppermute ring for SigLIP);
    without one, the single-device loss is used.

    ``loss``: "infonce" (default, the CLIP objective) or "siglip" (pairwise
    sigmoid; requires ``logit_bias`` in the param tree — see
    ``add_siglip_params``).

    Parallelism knobs beyond data parallelism:

    * **pipeline** — when ``mesh`` has a ``"pipe"`` axis of size > 1, both
      towers' block stacks run the GPipe schedule
      (``parallel/pipeline.py``); ``pp_microbatches`` sets the microbatch
      count (default ``2 * n_stages``).  Requires both towers' layer counts
      divisible by the stage count and the *per-data-shard* batch divisible
      by the microbatch count.
    * **sequence parallel** — ``seq_parallel=True`` (needs a ``"model"``
      axis > 1) pins inter-block activations to
      ``P("data", "model", None)``: Megatron-SP via GSPMD layout
      constraints (see ``layers.transformer_forward``).  Numerically a
      no-op; layout only.
    * **fsdp / ZeRO** — ``fsdp=True``: caller places params/opt state with
      ``sharding.shard_params(..., fsdp=True)`` / ``shard_opt_state`` so
      each data rank stores 1/dp of the (param, mu, nu) triple; XLA
      all-gathers weights just-in-time and reduce-scatters their grads.
      The step re-pins the updated params to the FSDP layout so they never
      drift back to replicated across iterations.  Numerically identical
      to plain DP (pinned in tests/test_fsdp.py).  Composes with tp AND
      with pp (block weights shard ``P("pipe", "data", "model")``); under
      pp the just-in-time weight gather runs once per GPipe tick instead
      of once per step — pay that only when the 1/(dp*pp) memory is needed.

    Stochastic training knobs (both run INSIDE the jitted step and make it
    take a trailing per-step ``rng`` argument):

    * ``augment`` — an ``AugmentConfig`` (``data/augment.py``): per-sample
      random-resized-crop (+ optional h-flip) of every batch on device.
    * ``cfg.patch_dropout > 0`` — FLIP masking: a random subset of vision
      patch tokens is dropped per sample (``models/clip.py::_patch_dropout``),
      cutting vision-tower FLOPs ~proportionally.
    """
    if loss not in ("infonce", "siglip"):
        raise ValueError(f"unknown loss {loss!r}: use 'infonce' or 'siglip'")

    from tapclip_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS

    pp = mesh.shape.get(PIPE_AXIS, 1) if mesh is not None else 1
    if fsdp:
        if mesh is None or mesh.shape.get(DATA_AXIS, 1) <= 1:
            raise ValueError("fsdp needs a mesh with a 'data' axis > 1")
    transformer_fn = None
    if pp > 1:
        from tapclip_tpu.parallel.pipeline import (
            check_pipeline_geometry, make_pipeline_transformer_fn,
        )

        for n_layers in (cfg.vision_layers, cfg.text_layers):
            check_pipeline_geometry(n_layers, pp, batch=1, n_microbatches=1)
        n_micro = pp_microbatches or 2 * pp
        transformer_fn = make_pipeline_transformer_fn(
            mesh, n_micro, remat=cfg.remat if cfg.remat != "none" else "full"
        )

    act_sharding = None
    if seq_parallel:
        if mesh is None or mesh.shape.get(MODEL_AXIS, 1) <= 1:
            raise ValueError(
                "seq_parallel needs a mesh with a 'model' axis > 1"
            )
        from jax.sharding import NamedSharding

        act_sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    # Pretraining differentiates the TOWERS themselves. The fused kernels are
    # kept engaged end-to-end: the attention cores have dedicated Pallas
    # backward kernels (fused_mha/_mha_bwd_kernel, flash_attention/
    # _attn_bwd_kernel), and the block-fusion wrappers recompute through the
    # split composition that reuses those cores. NOTE a measured negative
    # result (round 3): routing training to attn_impl="fused_split" so XLA
    # saves qkv/mha activations instead of recomputing them was SLOWER
    # (180.8 vs 175.7 ms at ViT-B/16 bs=128) — the recompute is not the
    # backward's bottleneck; saved-activation HBM round trips cost as much.

    needs_rng = augment is not None or cfg.patch_dropout > 0.0
    # Fully-locked towers (LiT): stop_gradient on the frozen subtree PRUNES
    # its backward pass (open_clip's requires_grad=False economics — the
    # optimizer-side set_to_zero alone would still compute, then discard,
    # roughly half the step's FLOPs) and keeps the frozen tower's gradients
    # out of any --grad-clip global norm. lock_tower_optimizer is still
    # required on top: AdamW's weight decay moves params even at zero grad.
    locked_keys = ({"visual"} if lock_image else set()) | (
        {"text"} if lock_text else set()
    )

    def _freeze_subtree(k, sub):
        frozen = jax.tree.map(jax.lax.stop_gradient, sub)
        if k == "visual" and isinstance(sub, dict) and "vpt" in sub:
            # VPT fine-tuning: the learned visual prompts stay trainable
            # through an image-tower lock (the whole point of
            # --lock-image-tower --vpt-tokens N).
            frozen = dict(frozen, vpt=sub["vpt"])
        return frozen

    def loss_fn(params, images, token_ids, rng=None):
        if locked_keys:
            params = dict(
                params,
                **{k: _freeze_subtree(k, params[k]) for k in locked_keys},
            )
        moe_losses = []
        pd_rng = None
        if needs_rng:
            aug_rng, pd_rng = jax.random.split(rng)
            if augment is not None:
                from tapclip_tpu.data.augment import augment_batch

                if images.dtype == jnp.uint8:
                    # Normalize first (commutes exactly with the crop) so
                    # the resample runs in float.
                    from tapclip_tpu.data.preprocess import device_normalize

                    images = device_normalize(images)
                images = augment_batch(aug_rng, images, augment)
            if cfg.patch_dropout <= 0.0:
                pd_rng = None
        img = clip_model.encode_image(
            params, cfg, images, rng=pd_rng,
            transformer_fn=transformer_fn, act_sharding=act_sharding,
            moe_loss_out=moe_losses,
        )
        txt = clip_model.encode_text(
            params, cfg, token_ids,
            transformer_fn=transformer_fn, act_sharding=act_sharding,
            moe_loss_out=moe_losses,
        )
        scale = params["logit_scale"]
        sharded = mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1
        if loss == "siglip":
            bias = params["logit_bias"]
            if sharded:
                total = siglip_loss_global(img, txt, scale, bias, mesh)
            else:
                total = siglip_loss_local(img, txt, scale, bias)
        elif sharded:
            total = contrastive_loss_global(img, txt, scale, mesh)
        else:
            total = contrastive_loss_local(img, txt, scale)
        if moe_losses:
            # Switch load balance over both towers' layers (moe.py); keeps
            # expert assignment near-uniform so the static capacity holds.
            total = total + cfg.moe_aux_weight * sum(moe_losses)
        return total

    # Donate params + optimizer state: the step consumes and replaces them,
    # so XLA can update in place — without donation two full copies of
    # (params, mu, nu) coexist and full-tower training OOMs at half the
    # batch it should handle.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, token_ids, rng=None):
        if needs_rng and rng is None:
            raise ValueError(
                "this step was built with augment/patch_dropout: pass a "
                "per-step rng as the trailing argument"
            )
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, token_ids, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # CLIP clamps the logit scale to ln(100) (open_clip semantics).
        params = dict(params, logit_scale=jnp.clip(params["logit_scale"], None, jnp.log(100.0)))
        if fsdp:
            from jax.sharding import NamedSharding
            from tapclip_tpu.parallel.sharding import clip_param_specs

            specs = clip_param_specs(params, mesh, fsdp=True)
            params = jax.tree.map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)
                ),
                params,
                specs,
            )
        return params, opt_state, {"loss": loss}

    return step


def make_accum_pretrain_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    k: int,
    mesh: Optional[Mesh] = None,
    loss: str = "infonce",
    augment=None,
) -> Callable:
    """Gradient accumulation with FULL-macro-batch contrastive negatives.

    ``optax.MultiSteps`` accumulation (``pretrain_cli --accum-steps``) grows
    the *gradient* batch but keeps negatives per-micro-batch — the
    contrastive task gets no harder.  This step implements the
    GradCache / open_clip ``--accum-freq`` recipe, which preserves the
    exact K×B-batch objective at one-micro-batch activation memory:

    1. **Feature pass** (no grad): encode all K micro-batches sequentially
       (``lax.map`` — one micro-batch of activations live at a time) and
       cache the [K, B, E] feature tables.
    2. **Gradient pass**: for each micro-batch, re-encode it
       differentiably, splice its live features into the cached table, and
       take the gradient of the FULL K·B-batch loss — only micro ``i``'s
       tower activations exist during its backward.  Summing over ``i``
       gives exactly d(full loss)/d(towers): each feature row's cotangent
       reaches its tower through precisely one micro step.
    3. ``logit_scale`` (and SigLIP's ``logit_bias``) reach the loss
       directly in EVERY micro step, so their accumulated gradient is K×
       the true one — divided back out before the update (a bias open_clip
       leaves in; here the K-step composition is exactly the one-shot
       step, asserted in tests).

    Cost: 3 tower passes per sample (2 fwd + 1 bwd) instead of 2 — the
    standard GradCache overhead (~1.3x step time) in exchange for
    negatives scaling far past the activation-memory wall.

    Under a mesh, negatives span K·B·dp: the spliced [K·B_local, E] tables
    feed the same global-batch collectives as the plain step.

    MoE towers: the Switch load-balance aux joins each micro's objective as
    the per-micro MEAN (``moe_aux_weight / k * sum(lb_i)``) — the joint-K·B
    lb is not computable at one-micro activation memory, so this one term
    (unlike the contrastive loss) is the accumulation-standard approximation.

    Returns ``step(params, opt_state, images [K*B, ...], token_ids
    [K*B, T], rng=None) -> (params, opt_state, {"loss": ...})``; ``rng``
    is required when ``augment``/``cfg.patch_dropout`` are active
    (micro-batch feature/grad passes reuse the same fold so the cached and
    live features agree exactly).
    """
    if loss not in ("infonce", "siglip"):
        raise ValueError(f"unknown loss {loss!r}: use 'infonce' or 'siglip'")
    if k < 2:
        raise ValueError("accumulation needs k >= 2 (use make_pretrain_step)")
    needs_rng = augment is not None or cfg.patch_dropout > 0.0
    sharded = mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1

    def encode_pair(params, images, token_ids, rng, moe_loss_out=None):
        if images.dtype == jnp.uint8:
            from tapclip_tpu.data.preprocess import device_normalize

            images = device_normalize(images)
        pd_rng = rng if (rng is not None and cfg.patch_dropout > 0) else None
        img = clip_model.encode_image(
            params, cfg, images, rng=pd_rng, moe_loss_out=moe_loss_out
        )
        txt = clip_model.encode_text(
            params, cfg, token_ids, moe_loss_out=moe_loss_out
        )
        return img, txt

    def full_loss(params, img_all, txt_all):
        scale = params["logit_scale"]
        if loss == "siglip":
            bias = params["logit_bias"]
            if sharded:
                return siglip_loss_global(img_all, txt_all, scale, bias, mesh)
            return siglip_loss_local(img_all, txt_all, scale, bias)
        if sharded:
            return contrastive_loss_global(img_all, txt_all, scale, mesh)
        return contrastive_loss_local(img_all, txt_all, scale)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, token_ids, rng=None):
        if needs_rng and rng is None:
            raise ValueError(
                "this step was built with augment/patch_dropout: pass a "
                "per-step rng as the trailing argument"
            )
        n = images.shape[0]
        if n % k:
            raise ValueError(f"macro batch {n} not divisible by k={k}")
        if augment is not None:
            from tapclip_tpu.data.augment import augment_batch

            if images.dtype == jnp.uint8:
                from tapclip_tpu.data.preprocess import device_normalize

                images = device_normalize(images)
            a_rng, rng = jax.random.split(rng)
            images = augment_batch(a_rng, images, augment)
        imgs_k = images.reshape(k, n // k, *images.shape[1:])
        ids_k = token_ids.reshape(k, n // k, token_ids.shape[-1])
        if sharded:
            # Each micro-batch spans all data shards (the negatives
            # collective needs every chip holding rows of every micro).
            from jax.sharding import NamedSharding

            spec_i = P(None, DATA_AXIS, *([None] * (imgs_k.ndim - 2)))
            imgs_k = jax.lax.with_sharding_constraint(
                imgs_k, NamedSharding(mesh, spec_i)
            )
            ids_k = jax.lax.with_sharding_constraint(
                ids_k, NamedSharding(mesh, P(None, DATA_AXIS, None))
            )
        rngs = (
            jax.random.split(rng, k) if needs_rng
            else jnp.zeros((k, 2), jnp.uint32)
        )

        # Pass 1: cached feature tables, sequential to bound memory.
        feats_i, feats_t = jax.lax.map(
            lambda xs: encode_pair(
                params, xs[0], xs[1], xs[2] if needs_rng else None
            ),
            (imgs_k, ids_k, rngs),
        )
        feats_i = jax.lax.stop_gradient(feats_i)
        feats_t = jax.lax.stop_gradient(feats_t)

        def micro_loss(p, i):
            moe_losses = []
            fi, ft = encode_pair(
                p, imgs_k[i], ids_k[i], rngs[i] if needs_rng else None,
                moe_loss_out=moe_losses,
            )
            img_all = jax.lax.dynamic_update_index_in_dim(feats_i, fi, i, 0)
            txt_all = jax.lax.dynamic_update_index_in_dim(feats_t, ft, i, 0)
            e = img_all.shape[-1]
            total = full_loss(p, img_all.reshape(n, e), txt_all.reshape(n, e))
            if moe_losses:
                # MoE load balance as the per-micro MEAN (each micro's lb is
                # over its own B tokens; the joint-K·B lb is not computable
                # at one-micro activation memory — so THIS term, unlike the
                # contrastive one, is the accumulation-standard approximation).
                total = total + cfg.moe_aux_weight / k * sum(moe_losses)
            return total

        grad_fn = jax.value_and_grad(micro_loss)

        def body(i, carry):
            acc, acc_l = carry
            l, g = grad_fn(params, i)
            # mean over micros: identical micros report identical values for
            # dense towers; for MoE it folds every micro's lb term in.
            return jax.tree.map(jnp.add, acc, g), acc_l + l / k

        zeros = jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype), params
        )
        grads, loss_val = jax.lax.fori_loop(
            0, k, body, (zeros, jnp.float32(0.0))
        )
        # scale/bias took the full-batch gradient K times (see docstring).
        grads = dict(grads, logit_scale=grads["logit_scale"] / k)
        if "logit_bias" in grads:
            grads = dict(grads, logit_bias=grads["logit_bias"] / k)

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = dict(
            params,
            logit_scale=jnp.clip(params["logit_scale"], None, jnp.log(100.0)),
        )
        return params, opt_state, {"loss": loss_val}

    return step


def lock_tower_optimizer(optimizer, *, lock_image: bool = False,
                         lock_text: bool = False, unlocked_groups: int = 0):
    """LiT-style locked-tower fine-tuning (Zhai et al., "LiT: Zero-Shot
    Transfer with Locked-image text Tuning"; open_clip's
    ``--lock-image`` / ``--lock-text``).

    ``optax.multi_transform``: the locked tower's subtree routes to
    ``set_to_zero`` (no updates, no AdamW moments, no weight decay) — the
    frozen weights stay bit-identical, not merely small-lr.  (NOT
    ``optax.masked``, which PASSES THROUGH the raw gradients of unmasked
    leaves instead of zeroing them.)  ``logit_scale`` (and any other
    top-level extras, e.g. the SigLIP bias) stay trainable.

    ``unlocked_groups`` (open_clip's ``lock_*_tower(unlocked_groups=N)``):
    the tower's groups are [stem, block_0, ..., block_{L-1}, head]; the
    LAST N stay trainable (N=1 -> the projection head only, N=2 -> head +
    final block, ...).  Transformer (stacked-blocks) towers only.  Because
    the block stack is ONE stacked leaf per weight, per-layer freezing is
    applied as an update mask over the leading layer axis AFTER the inner
    optimizer — frozen layers stay bit-identical (the mask also kills
    their weight-decay term, which rides inside AdamW's update).
    """
    import optax

    if not (lock_image or lock_text):
        return optimizer
    if lock_image and lock_text:
        raise ValueError("locking BOTH towers leaves nothing to train")
    locked = {"visual"} if lock_image else set()
    if lock_text:
        locked.add("text")

    if unlocked_groups <= 0:

        def labels(params):
            def label_subtree(k, v):
                if k not in locked:
                    return jax.tree.map(lambda _: "train", v)
                if k == "visual" and isinstance(v, dict) and "vpt" in v:
                    # learned visual prompts train through the lock
                    return {
                        kk: jax.tree.map(
                            lambda _: "train" if kk == "vpt" else "freeze", vv
                        )
                        for kk, vv in v.items()
                    }
                return jax.tree.map(lambda _: "freeze", v)

            return {k: label_subtree(k, v) for k, v in params.items()}

        return optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels
        )

    (tower,) = locked
    head_keys = (
        {"ln_post", "proj"} if tower == "visual"
        else {"ln_final", "text_projection"}
    )

    def _mask_tower(updates):
        sub = updates[tower]
        if "blocks" not in sub:
            raise ValueError(
                "unlocked_groups requires a stacked-blocks (transformer) "
                f"tower; {tower!r} has keys {sorted(sub)}"
            )
        L = jax.tree.leaves(sub["blocks"])[0].shape[0]
        G = L + 2  # stem + L blocks + head
        n = min(unlocked_groups, G)
        first_unlocked_layer = L - max(0, n - 1)  # head is the last group
        stem_unlocked = n >= G

        def blk(x):
            m = (jnp.arange(L) >= first_unlocked_layer).astype(x.dtype)
            return x * m.reshape((L,) + (1,) * (x.ndim - 1))

        out = {}
        for k, v in sub.items():
            if k == "blocks":
                out[k] = jax.tree.map(blk, v)
            elif k in head_keys or k == "vpt" or stem_unlocked:
                out[k] = v
            else:  # stem (embeddings / pre-LN): frozen until n == G
                out[k] = jax.tree.map(jnp.zeros_like, v)
        return dict(updates, **{tower: out})

    def init(params):
        return optimizer.init(params)

    def update(grads, state, params=None):
        updates, state = optimizer.update(grads, state, params)
        return _mask_tower(updates), state

    return optax.GradientTransformation(init, update)


#: Param-tree leaf suffixes that BitFit trains (every additive bias term:
#: LN/BN biases + the attention/MLP projection biases — "/b" is the
#: RN-family attnpool projection bias; LN *scales* are multiplicative and
#: stay frozen per the paper, as do BN running stats).
BITFIT_SUFFIXES = ("/bias", "/b_qkv", "/b_out", "/b_fc", "/b_proj", "/b")


def bitfit_optimizer(optimizer):
    """BitFit (Ben Zaken et al. 2022): train ONLY the bias terms.

    The third PEFT axis next to LoRA (low-rank weight deltas, ``peft.py``)
    and VPT (input prompts): ~0.1% of the params train, everything else is
    routed to ``optax.set_to_zero`` via ``multi_transform`` (bit-identical
    frozen weights, no AdamW moments, no weight decay — same mechanics as
    :func:`lock_tower_optimizer`).  Top-level extras outside the towers
    (``logit_scale``, the SigLIP ``logit_bias``) stay trainable, matching
    the locked-tower convention.  Unlike a tower lock there is no
    stop-gradient pruning: biases live in every block, so the full
    backward must run regardless.
    """
    import optax
    from jax.tree_util import tree_map_with_path

    def _leaf_path(path) -> str:
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def labels(params):
        def lab(path, _):
            s = _leaf_path(path)
            if not s.startswith(("visual/", "text/")):
                return "train"  # logit_scale / logit_bias / kd_proj extras
            if s == "visual/vpt":
                return "train"  # VPT prompts are PEFT params, not weights
            return "train" if s.endswith(BITFIT_SUFFIXES) else "freeze"

        return tree_map_with_path(lab, params)

    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels
    )


def make_ema_update(decay: float) -> Callable:
    """Jitted EMA tracker for pretraining (open_clip/BYOL-style model
    averaging): ``ema = decay * ema + (1 - decay) * params``, donated so the
    average updates in place (one extra param-tree resident, no transients).
    Evaluate/serve from the EMA tree; train on the raw one."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(ema_params, params):
        return jax.tree.map(
            lambda e, p: (decay * e + (1.0 - decay) * p.astype(e.dtype)),
            ema_params,
            params,
        )

    return update


def make_validation_fn(cfg: CLIPConfig) -> Callable:
    """Pretraining validation: contrastive val loss + retrieval Recall@K.

    Returns ``validate(params, batches, max_samples=1024) -> (loss, metrics)``
    where ``batches`` yields jit-ready ``(images, token_ids)`` (e.g. a
    ``data.shards.ShardLoader``).  Features are encoded in capped batches by
    one cached executable; the loss and R@K are computed over the pooled
    features — the standard open_clip validation readout, absent from the
    reference (its contrastive loss is an unimplemented sketch,
    ``/root/reference/models/model_wrapper.py:94-99``).
    """
    import numpy as np

    feats_fn = jax.jit(
        lambda params, images, ids: (
            clip_model.encode_image(params, cfg, images),
            clip_model.encode_text(params, cfg, ids),
        )
    )
    loss_fn = jax.jit(contrastive_loss_local)

    def validate(params, batches, max_samples: int = 1024):
        from tapclip_tpu.utils.eval_metrics import retrieval_recall

        imgs, txts, n = [], [], 0
        for images, ids in batches:
            fi, ft = feats_fn(params, jnp.asarray(images), jnp.asarray(ids))
            imgs.append(np.asarray(fi))
            txts.append(np.asarray(ft))
            n += int(images.shape[0])
            if n >= max_samples:
                break
        if not imgs:
            raise ValueError("validation stream produced no batches")
        img = np.concatenate(imgs)[:max_samples]
        txt = np.concatenate(txts)[:max_samples]
        vloss = float(
            loss_fn(jnp.asarray(img), jnp.asarray(txt), params["logit_scale"])
        )
        return vloss, retrieval_recall(img, txt)

    return validate
