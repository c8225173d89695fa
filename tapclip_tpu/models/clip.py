"""From-scratch functional CLIP (vision ViT + causal text transformer).

TPU-native rebuild of the model the reference wraps via open_clip
(``/root/reference/models/clip_wrapper.py:10-27``).  Differences by design:

* Pure functions over an explicit param pytree — no modules, no hooks.  The
  attention-capture hook (``clip_wrapper.py:29-40``) becomes the
  ``attn_to_idx`` aux output threaded through ``transformer_forward``.
* Patch embedding is a reshape + matmul (MXU-friendly) instead of a strided
  conv — numerically identical to ``Conv2d(stride=patch)``.
* ``text_forward_embeds`` reproduces the reference's *raw transformer* call
  path (``model_wrapper.py:58,72``): embeddings straight into the blocks with
  no positional embedding, no causal mask, no ln_final, pooled at a chosen
  position.  ``encode_text`` is the proper CLIP text encoder (pos emb +
  causal mask + ln_final + EOT-argmax pooling) used for idiomatic mode and
  standard zero-shot eval.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import layers

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    """Random-init the full param tree as ONE compiled program.

    Unjitted, the ~200 individual RNG calls each dispatch separately — painful
    on remote/tunneled devices; jit collapses them into a single executable.
    """
    return _init_clip_params_jit(key, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def _init_clip_params_jit(key: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt, ke, kp, kc, kpe, ktp, kvp = jax.random.split(key, 8)
    vw, tw = cfg.vision_width, cfg.text_width
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    if cfg.vision_tower == "resnet":
        from tapclip_tpu.models.resnet import init_resnet_params

        if cfg.moe_experts > 0:
            raise NotImplementedError(
                "moe_experts applies to ViT towers only "
                "(the RN-family tower has no per-block MLP bank)"
            )
        if cfg.vpt_tokens > 0:
            raise NotImplementedError(
                "vpt_tokens applies to ViT towers only "
                "(the RN-family tower has no token sequence to prompt)"
            )
        visual = init_resnet_params(kv, cfg)
        return {
            "visual": visual,
            "text": _init_text_params(kt, ke, kpe, ktp, cfg),
            "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
        }
    if cfg.moe_experts > 0:
        from tapclip_tpu.models.moe import init_moe_blocks

        init_tower_blocks = functools.partial(
            init_moe_blocks, n_experts=cfg.moe_experts
        )
    else:
        init_tower_blocks = layers.init_blocks
    visual = {
        "patch_embed": {
            "w": jax.random.normal(kp, (patch_dim, vw), jnp.float32) * (vw ** -0.5)
        },
        "class_embedding": jax.random.normal(kc, (vw,), jnp.float32) * (vw ** -0.5),
        "positional_embedding": (
            jax.random.normal(kpe, (cfg.vision_seq_len, vw), jnp.float32) * (vw ** -0.5)
        ),
        "ln_pre": layers.init_layer_norm(vw),
        "blocks": init_tower_blocks(kv, cfg.vision_layers, vw, mlp_ratio=cfg.mlp_ratio),
        "ln_post": layers.init_layer_norm(vw),
        "proj": jax.random.normal(kvp, (vw, cfg.embed_dim), jnp.float32) * (vw ** -0.5),
    }
    if cfg.vpt_tokens > 0:
        visual["vpt"] = init_vpt_params(jax.random.fold_in(kv, 1), cfg)
    return {
        "visual": visual,
        "text": _init_text_params(kt, ke, kpe, ktp, cfg),
        # CLIP's own logit scale, init ln(1/0.07) (the FullModel keeps a
        # separate learnable copy per model_wrapper.py:26).
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
    }


def init_vpt_params(key: jax.Array, cfg: CLIPConfig) -> jnp.ndarray:
    """Fresh VPT prompt tokens: ``[P, W]`` shallow, ``[L, P, W]`` deep."""
    shape = (
        (cfg.vision_layers, cfg.vpt_tokens, cfg.vision_width)
        if cfg.vpt_deep
        else (cfg.vpt_tokens, cfg.vision_width)
    )
    return jax.random.normal(key, shape, jnp.float32) * (
        cfg.vision_width ** -0.5
    )


def ensure_vpt_params(params: Params, cfg: CLIPConfig, seed: int = 0) -> Params:
    """Inject fresh VPT tokens into a loaded tree that predates them.

    Pretrained checkpoints (open_clip ``.bin`` / Orbax trees saved without
    ``vpt_tokens``) have no ``visual.vpt`` leaf; every loading path calls
    this so ``--vpt-tokens N`` composes with ``--pretrained``.  A tree that
    already carries prompts of a DIFFERENT length is a config mismatch —
    fail loudly rather than silently re-initialize trained prompts.
    """
    if cfg.vpt_tokens <= 0 or cfg.vision_tower == "resnet":
        return params
    visual = params.get("visual", {})
    if "vpt" in visual:
        expected = (
            (cfg.vision_layers, cfg.vpt_tokens, cfg.vision_width)
            if cfg.vpt_deep
            else (cfg.vpt_tokens, cfg.vision_width)
        )
        if tuple(visual["vpt"].shape) != expected:
            raise ValueError(
                f"checkpoint carries VPT tokens of shape "
                f"{tuple(visual['vpt'].shape)} but the config expects "
                f"{expected} (vpt_tokens={cfg.vpt_tokens}, "
                f"vpt_deep={cfg.vpt_deep}); load with the matching config"
            )
        return params
    return dict(
        params,
        visual=dict(
            visual, vpt=init_vpt_params(jax.random.PRNGKey(seed), cfg)
        ),
    )


def _init_text_params(kt, ke, kpe, ktp, cfg: CLIPConfig) -> Params:
    tw = cfg.text_width
    if cfg.moe_experts > 0:
        from tapclip_tpu.models.moe import init_moe_blocks

        init_tower_blocks = functools.partial(
            init_moe_blocks, n_experts=cfg.moe_experts
        )
    else:
        init_tower_blocks = layers.init_blocks
    return {
        "token_embedding": jax.random.normal(ke, (cfg.vocab_size, tw), jnp.float32) * 0.02,
        "positional_embedding": (
            jax.random.normal(kpe, (cfg.context_length, tw), jnp.float32) * 0.01
        ),
        "blocks": init_tower_blocks(kt, cfg.text_layers, tw, mlp_ratio=cfg.mlp_ratio),
        "ln_final": layers.init_layer_norm(tw),
        "text_projection": jax.random.normal(ktp, (tw, cfg.embed_dim), jnp.float32)
        * (tw ** -0.5),
    }


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def _pick_transformer_fn(cfg: CLIPConfig, transformer_fn):
    """Resolve the block-stack runner: explicit override (pipeline
    parallelism) > MoE routing (``cfg.moe_experts``) > the sequential scan."""
    if cfg.moe_experts > 0:
        if transformer_fn is not None:
            raise NotImplementedError(
                "pipeline parallelism over MoE towers is not supported "
                "(expert + pipeline sharding do not compose yet)"
            )
        from tapclip_tpu.models.moe import moe_transformer_forward

        return functools.partial(
            moe_transformer_forward, capacity_factor=cfg.moe_capacity_factor
        )
    return transformer_fn or layers.transformer_forward


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC images -> [B, num_patches, patch*patch*C] (row-major patches).

    Flatten order is (ph, pw, c) — the weight converter permutes torch's
    ``[O, C, kh, kw]`` conv kernel to match.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw ph pw C
    return x.reshape(B, gh * gw, patch * patch * C)


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    *,
    rng=None,
    transformer_fn=None,
    act_sharding=None,
    moe_loss_out=None,
    maple_prompts=None,
) -> jnp.ndarray:
    """Images ``[B, H, W, 3]`` (preprocessed) -> features ``[B, embed_dim]``.

    ``maple_prompts`` (MaPLe coupled vision prompts): a tuple
    ``(input_prompts [P, W], deep_prompts [n_layers-1, P, W] | None,
    deep_mask [n_layers-1] | None)`` of prompts COMPUTED by the caller
    (projections of the text prompts — ``model_wrapper.py``'s MaPLe
    branch) instead of read from ``params["visual"]["vpt"]``; insertion
    placement is identical to VPT.  Mutually exclusive with
    ``cfg.vpt_tokens``.

    Matches open_clip ``VisionTransformer.forward`` + projection; the caller
    L2-normalizes (as ``model_wrapper.py:41`` does).

    ``rng`` enables the stochastic TRAINING path: with
    ``cfg.patch_dropout > 0`` a random per-sample subset of patch tokens is
    dropped (FLIP masking — see :func:`_patch_dropout`).  Eval/serving
    callers never pass it, so inference is always exact.

    ``transformer_fn`` overrides the block-stack runner (default
    ``layers.transformer_forward``) — used by pipeline parallelism
    (``parallel/pipeline.py::make_pipeline_transformer_fn``) so the embed /
    pool glue lives only here.  ``act_sharding`` pins the inter-block
    activation layout (sequence parallelism, see ``transformer_forward``).
    """
    if cfg.vision_tower == "resnet":
        if rng is not None and cfg.patch_dropout > 0:
            raise NotImplementedError(
                "patch_dropout applies to ViT towers only "
                "(the RN-family tower has no patch-token sequence)"
            )
        if maple_prompts is not None:
            raise NotImplementedError(
                "MaPLe vision prompts apply to ViT towers only "
                "(the RN-family tower has no token sequence)"
            )
        from tapclip_tpu.models.resnet import resnet_encode_image

        if transformer_fn is not None:
            raise NotImplementedError(
                "pipeline parallelism applies to transformer towers only "
                "(the RN-family tower has no stacked block axis to stage)"
            )
        if cfg.quantize_tower:
            # int8 covers the transformer towers only; failing loudly beats
            # a config whose quantization flag is a silent no-op.
            raise NotImplementedError(
                "quantize_tower is implemented for ViT towers only "
                "(the RN-family tower is convolutional)"
            )
        if cfg.token_keep_ratio < 1.0:
            raise NotImplementedError(
                "token_keep_ratio applies to ViT towers only "
                "(the RN-family tower has no token sequence to prune)"
            )
        if images.dtype == jnp.uint8:
            from tapclip_tpu.data.preprocess import device_normalize

            images = device_normalize(images)
        return resnet_encode_image(params, cfg, images)
    p = params["visual"]
    dtype = cfg.compute_dtype
    if images.dtype == jnp.uint8:
        # uint8 host->device transfer path (4x less bandwidth): CLIP
        # normalization fuses into this program, bit-identical to the
        # host-normalized float pipeline (data/preprocess.py).
        from tapclip_tpu.data.preprocess import device_normalize

        images = device_normalize(images)
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = jnp.dot(x, p["patch_embed"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    x = x.astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)[None]
    if rng is not None and cfg.patch_dropout > 0:
        if cfg.token_keep_ratio < 1.0:
            raise NotImplementedError(
                "patch_dropout (training) and token_keep_ratio (eval "
                "pruning) do not compose — pick one per call"
            )
        x = _patch_dropout(x, cfg.patch_dropout, rng)
    layer_prompts = None
    prompt_mask = None
    if maple_prompts is not None:
        if cfg.vpt_tokens > 0:
            raise NotImplementedError(
                "maple prompts and vpt_tokens both claim the prompt slots "
                "— pick one prompt source per model"
            )
        if cfg.token_keep_ratio < 1.0:
            raise NotImplementedError(
                "maple prompts do not compose with token_keep_ratio "
                "(pruning would silently drop the coupled prompts)"
            )
        if transformer_fn is not None or cfg.moe_experts > 0:
            raise NotImplementedError(
                "maple prompts require the sequential block scan "
                "(no pipeline/MoE transformer_fn override)"
            )
        m_in, layer_prompts, prompt_mask = maple_prompts
        m_in = m_in.astype(dtype)
        if layer_prompts is not None:
            layer_prompts = layer_prompts.astype(dtype)
        vpt = jnp.broadcast_to(
            m_in, (x.shape[0], m_in.shape[0], x.shape[-1])
        )
        x = jnp.concatenate([x[:, :1], vpt, x[:, 1:]], axis=1)
    elif cfg.vpt_tokens > 0:
        if cfg.token_keep_ratio < 1.0:
            raise NotImplementedError(
                "vpt_tokens does not compose with token_keep_ratio "
                "(pruning would silently drop the learned prompts)"
            )
        # VPT: learned prompts at positions 1..P (class token stays at 0
        # for pooling; patches shift right). Inserted AFTER patch dropout
        # so the prompts are never dropped, and AFTER the positional
        # embedding so they carry no patch position (they are their own
        # learned vectors, the paper's placement). Deep variant: row 0 at
        # the input, rows 1..L-1 overwrite the prompt slots at each block
        # input inside the scan (layers.transformer_forward).
        vpt_all = p["vpt"].astype(dtype)
        if cfg.vpt_deep:
            if transformer_fn is not None or cfg.moe_experts > 0:
                raise NotImplementedError(
                    "vpt_deep requires the sequential block scan "
                    "(no pipeline/MoE transformer_fn override)"
                )
            vpt_in, layer_prompts = vpt_all[0], vpt_all[1:]
        else:
            vpt_in = vpt_all
        vpt = jnp.broadcast_to(
            vpt_in, (x.shape[0], cfg.vpt_tokens, x.shape[-1])
        )
        x = jnp.concatenate([x[:, :1], vpt, x[:, 1:]], axis=1)
    x = layers.layer_norm(x, p["ln_pre"], cfg.ln_eps)
    # Run the tower at a sublane-aligned (multiple-of-8) sequence length:
    # XLA picks better schedules for the per-block dots, and the fused MHA
    # kernel masks padded keys (valid=T) so real outputs are identical (the
    # pooled class token is position 0; pad rows never feed real ones).
    T = x.shape[1]
    Tp = (T + 7) // 8 * 8
    kv_valid = None
    if Tp != T:
        x = jnp.pad(x, [(0, 0), (0, Tp - T), (0, 0)])
        kv_valid = T

    if cfg.token_keep_ratio < 1.0 and cfg.token_prune_layer < cfg.vision_layers:
        if transformer_fn is not None or cfg.moe_experts > 0:
            raise NotImplementedError(
                "token pruning is not supported with a transformer_fn "
                "override or MoE towers (it targets the dense eval path)"
            )
        x = _forward_with_token_pruning(p, cfg, x, kv_valid)
    else:
        run = _pick_transformer_fn(cfg, transformer_fn)
        x, tower_aux = run(
            x,
            p["blocks"],
            cfg.vision_heads,
            act=cfg.act,
            ln_eps=cfg.ln_eps,
            kv_valid_len=kv_valid,
            impl=cfg.attn_impl,
            quantize=cfg.quantize_tower,
            quantize_deterministic=cfg.int8_deterministic,
            remat=cfg.remat,
            act_sharding=act_sharding,
            unroll=cfg.scan_unroll,
            **(
                {"layer_prompts": layer_prompts, "prompt_mask": prompt_mask}
                if layer_prompts is not None
                else {}
            ),
        )
        if cfg.moe_experts > 0 and moe_loss_out is not None:
            moe_loss_out.append(tower_aux)  # layer-summed load-balance loss
    x = layers.layer_norm(x, p["ln_post"], cfg.ln_eps)
    pooled = x[:, 0]
    return jnp.dot(
        pooled, p["proj"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def _patch_dropout(x: jnp.ndarray, prob: float, rng: jax.Array) -> jnp.ndarray:
    """FLIP-style random patch masking (training-time vision speedup).

    Keeps the class token (position 0) plus a uniformly-random
    ``1 - prob`` fraction of the patch tokens, independently per sample per
    step — the "Scaling Language-Image Pre-training via Masking" recipe,
    also open_clip's ``patch_dropout``.  Runs AFTER the positional embedding
    (each surviving token carries its position), so the shortened sequence
    is a faithful sparse view of the image.

    TPU-native form: random scores + ``top_k`` give a uniform
    without-replacement subset with a STATIC keep count (no boolean
    compaction, no dynamic shapes), and one ``take_along_axis`` gather does
    the compaction — its transpose (a scatter-add) is the whole backward.
    Token order after the gather is random, which attention is invariant to
    (pooling reads position 0, kept at slot 0).  The tower then runs at
    ``1 + n_keep`` tokens, cutting attention/MLP FLOPs ~proportionally;
    downstream sublane padding + kv_valid masking in :func:`encode_image`
    handle alignment exactly as for any other sequence length.
    """
    B, T, _ = x.shape
    n_patches = T - 1
    n_keep = max(1, int(round(n_patches * (1.0 - prob))))
    if n_keep >= n_patches:
        return x
    scores = jax.random.uniform(rng, (B, n_patches))
    _, idx = jax.lax.top_k(scores, n_keep)  # [B, n_keep], random subset
    idx = jnp.concatenate(
        [jnp.zeros((B, 1), idx.dtype), idx + 1], axis=1
    )  # class token always at slot 0
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _forward_with_token_pruning(p, cfg: CLIPConfig, x: jnp.ndarray, kv_valid):
    """Attention-aware token filtering (EViT/ATS-style, PAPERS.md theme).

    Runs ``token_prune_layer`` full blocks, scores the remaining patches by
    the class query's head-averaged attention under the NEXT block's
    attention weights, keeps the top ``token_keep_ratio`` (class token
    always), and runs the remaining blocks on the reduced sequence.
    Approximate — gated behind ``token_keep_ratio < 1``, eval-path use.
    """
    k = cfg.token_prune_layer
    blocks = p["blocks"]
    front = jax.tree.map(lambda a: a[:k], blocks)
    back = jax.tree.map(lambda a: a[k:], blocks)

    x, _ = layers.transformer_forward(
        x, front, cfg.vision_heads,
        act=cfg.act, ln_eps=cfg.ln_eps, kv_valid_len=kv_valid, impl=cfg.attn_impl,
        quantize=cfg.quantize_tower,
        quantize_deterministic=cfg.int8_deterministic,
        unroll=cfg.scan_unroll,
    )

    # Class-query attention row under block k's attention weights.
    blk = jax.tree.map(lambda a: a[0], back)
    y = layers.layer_norm(x, blk["ln_1"], cfg.ln_eps)
    W = y.shape[-1]
    H = cfg.vision_heads
    Dh = W // H
    w_q = blk["attn"]["w_qkv"][:, :W]
    w_k = blk["attn"]["w_qkv"][:, W : 2 * W]
    b_q = blk["attn"]["b_qkv"][:W]
    b_k = blk["attn"]["b_qkv"][W : 2 * W]
    q_cls = (y[:, :1] @ w_q.astype(y.dtype) + b_q.astype(y.dtype)).reshape(
        -1, 1, H, Dh
    )
    keys = (y @ w_k.astype(y.dtype) + b_k.astype(y.dtype)).reshape(
        y.shape[0], y.shape[1], H, Dh
    )
    logits = jnp.einsum("bqhd,bkhd->bhqk", q_cls, keys).astype(jnp.float32)
    logits = logits[:, :, 0] * (Dh ** -0.5)  # [B, H, T]
    if kv_valid is not None:
        ki = jnp.arange(y.shape[1])[None, None, :]
        logits = jnp.where(ki < kv_valid, logits, -jnp.inf)
    scores = jax.nn.softmax(logits, axis=-1).mean(axis=1)  # [B, T]

    T = x.shape[1]
    n_keep = max(8, int(T * cfg.token_keep_ratio) // 8 * 8)  # sublane multiple
    if kv_valid is not None:
        # Never keep more tokens than exist: past this point kv_valid is
        # dropped, so a padded row that survived the gather would become an
        # attendable key in the back blocks (pads score exactly 0, but guard
        # keep-ratios near 1 anyway). The sublane minimum of 8 rows still
        # applies — sequences shorter than 8 keep their pads regardless.
        n_keep = min(n_keep, max(kv_valid // 8 * 8, 8))
    # Always keep the class token: force its score to +inf.
    scores = scores.at[:, 0].set(jnp.inf)
    _, idx = jax.lax.top_k(scores, n_keep)  # [B, n_keep]
    x = jnp.take_along_axis(x, idx[:, :, None], axis=1)

    x, _ = layers.transformer_forward(
        x, back, cfg.vision_heads,
        act=cfg.act, ln_eps=cfg.ln_eps, impl=cfg.attn_impl,
        quantize=cfg.quantize_tower,
        quantize_deterministic=cfg.int8_deterministic,
        unroll=cfg.scan_unroll,
    )
    # top_k is ordered by score; the class token (inf) lands at position 0.
    return x


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, cfg: CLIPConfig, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids ``[B, T]`` -> embeddings ``[B, T, W]`` (frozen lookup).

    Equivalent of ``clip_model.model.token_embedding`` used by the prompt
    learner (``prompt_learner.py:13,33``).
    """
    return params["text"]["token_embedding"][token_ids]


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    token_ids: jnp.ndarray,
    *,
    transformer_fn=None,
    act_sharding=None,
    moe_loss_out=None,
) -> jnp.ndarray:
    """Proper CLIP text encoding: pos emb + causal mask + ln_final + EOT pool.

    ``transformer_fn`` / ``act_sharding`` / ``moe_loss_out``: see
    :func:`encode_image`.
    """
    p = params["text"]
    dtype = cfg.compute_dtype
    x = embed_tokens(params, cfg, token_ids).astype(dtype)
    x = x + p["positional_embedding"].astype(dtype)[None]
    # Pad once to a sublane multiple at the tower level (kv_valid masks the
    # pad keys; pad QUERY rows are causal-masked junk that is sliced off
    # before pooling) instead of letting the fused attention core pad/unpad
    # [B, T, 3W] inside every block.
    T = x.shape[1]
    Tp = (T + 7) // 8 * 8
    kv_valid = None
    if Tp != T:
        x = jnp.pad(x, [(0, 0), (0, Tp - T), (0, 0)])
        kv_valid = T
    run = _pick_transformer_fn(cfg, transformer_fn)
    x, tower_aux = run(
        x,
        p["blocks"],
        cfg.text_heads,
        act=cfg.act,
        ln_eps=cfg.ln_eps,
        causal=True,
        kv_valid_len=kv_valid,
        impl=cfg.attn_impl,
        remat=cfg.remat,
        act_sharding=act_sharding,
        unroll=cfg.scan_unroll,
    )
    if cfg.moe_experts > 0 and moe_loss_out is not None:
        moe_loss_out.append(tower_aux)
    if Tp != T:
        x = x[:, :T]
    x = layers.layer_norm(x, p["ln_final"], cfg.ln_eps)
    eot = jnp.argmax(token_ids, axis=-1)  # EOT has the largest token id
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(
        pooled, p["text_projection"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def text_forward_embeds(
    params: Params,
    cfg: CLIPConfig,
    embeds: jnp.ndarray,
    *,
    mode: str = "ref_compat",
    pool_idx=None,
    attn_to_idx=None,
    kv_valid_len=None,
    impl: Optional[str] = None,
    deep_prompts=None,
    deep_prompt_mask=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Text transformer over raw embeddings ``[B, T, W]``.

    ``deep_prompts`` (``[n_text_layers-1, P, W]``, MaPLe): row ``i``
    overwrites the context-token slots at block ``i+1``'s input — slots
    start at position 0 in ref_compat mode (``[ctx || tokens]``) and at
    position 1 in idiomatic mode (``[sot, ctx, ...]``).
    ``deep_prompt_mask`` limits the prompt depth (see
    ``layers.transformer_forward``).

    mode="ref_compat" reproduces the reference's bare-transformer call
    (``model_wrapper.py:58,72``): NO positional embedding, NO causal mask,
    NO ln_final; pool at position ``pool_idx`` (default T-1, matching
    ``text_feat[arange(B), -1]`` at ``model_wrapper.py:73``).

    mode="idiomatic" applies pos emb + causal mask + ln_final (for CoOp-style
    prompt tuning with well-formed sequences).

    Returns ``(features [B, embed_dim], attribution_aux [B, T] | None)`` where
    the aux is the last layer's head-averaged attention of every query to key
    position ``attn_to_idx``.
    """
    p = params["text"]
    dtype = cfg.compute_dtype
    x = embeds.astype(dtype)
    T = x.shape[1]
    if mode == "idiomatic":
        pos = p["positional_embedding"]
        if T > pos.shape[0]:
            raise ValueError(
                f"idiomatic mode requires T<= {pos.shape[0]}, got {T}"
            )
        x = x + pos[:T].astype(dtype)[None]
        causal = True
    elif mode == "ref_compat":
        causal = False
        # Pad to a sublane multiple so the fused attention/MLP kernels engage
        # (pad keys are masked; pad query rows never feed real outputs; the
        # pool/attribution indices reference pre-pad positions).
        Tp = (T + 7) // 8 * 8
        if Tp != T and kv_valid_len is None:
            x = jnp.pad(x, [(0, 0), (0, Tp - T), (0, 0)])
            kv_valid_len = T
    else:
        raise ValueError(f"unknown text mode {mode!r}")

    run = _pick_transformer_fn(cfg, None)
    deep_kwargs = {}
    if deep_prompts is not None:
        if cfg.moe_experts > 0:
            raise NotImplementedError(
                "deep text prompts (MaPLe) require the dense block scan "
                "(no MoE transformer)"
            )
        deep_kwargs = dict(
            layer_prompts=deep_prompts.astype(dtype),
            prompt_offset=0 if mode == "ref_compat" else 1,
            prompt_mask=deep_prompt_mask,
        )
    x, aux = run(
        x,
        p["blocks"],
        cfg.text_heads,
        act=cfg.act,
        ln_eps=cfg.ln_eps,
        causal=causal,
        kv_valid_len=kv_valid_len,
        attn_to_idx=attn_to_idx,
        impl=impl if impl is not None else cfg.attn_impl,
        **deep_kwargs,
    )
    if cfg.moe_experts > 0 and attn_to_idx is None:
        aux = None  # second output is the lb loss, not attribution aux
    if x.shape[1] != T:
        x = x[:, :T]
        if aux is not None:
            aux = aux[:, :T]
    if mode == "idiomatic":
        x = layers.layer_norm(x, p["ln_final"], cfg.ln_eps)

    if pool_idx is None:
        pooled = x[:, -1]
    elif isinstance(pool_idx, int):
        pooled = x[:, pool_idx]
    else:
        pooled = jnp.take_along_axis(x, pool_idx[:, None, None].astype(jnp.int32), axis=1)[
            :, 0
        ]
    feats = jnp.dot(
        pooled, p["text_projection"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    return feats, aux


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """x / ||x|| with a gradient that is finite at x = 0.

    ``jnp.linalg.norm`` has a NaN gradient at the origin (d||x||/dx = x/||x||
    = 0/0), and zero cotangents don't save you (0 * NaN = NaN) — padded
    prompt-bank rows are exactly zero, so the naive form poisons their AdamW
    state.  The smooth ``rsqrt(sum(x^2) + eps^2)`` form is within one ulp of
    the exact quotient for any real feature vector and has zero gradient
    contribution at the origin under a zero cotangent.
    """
    x32 = x.astype(jnp.float32)
    n2 = jnp.sum(x32 * x32, axis=axis, keepdims=True)
    return (x32 * jax.lax.rsqrt(n2 + eps * eps)).astype(x.dtype)


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
