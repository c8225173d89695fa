"""FullModel: frozen CLIP + prompt learner + attribution + adjustor.

TPU-native rebuild of ``/root/reference/models/model_wrapper.py``.  The
reference's forward runs a Python loop over classes with an inner loop over
samples — ``n_cls * B`` single-sample text-transformer calls per batch
(``model_wrapper.py:47-65``, SURVEY.md §3.2).  The fused design here exploits
an exact algebraic identity: the attribution pass's input
(``full_prompt = [ctx_i || cls_i]`` expanded over the batch,
``model_wrapper.py:49-51``) does not depend on the image at all, so every
sample's attribution row is identical.  Attribution is therefore computed
**once per class** — one batched ``[n_cls, T, D]`` text pass — and the whole
forward is:

    1 image-tower pass  +  2 class-batched text passes  (vs 1 + n_cls*(B+1))

with bitwise-identical semantics to the reference loop.

Gradient fidelity: attribution is computed under ``stop_gradient`` — the
reference's hook detaches the attention map (``clip_wrapper.py:36``), so
gradients reach the context vectors only through the adjustor's
``prompt_embed`` operand and the second text pass (SURVEY.md §3.2).

Loss: cross-entropy only; ``attr_lambda`` / ``stab_lambda`` are accepted and
unused, exactly like the reference (``model_wrapper.py:24-25,91-93``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tapclip_tpu.config import CLIPConfig, PromptConfig
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models.attribution_monitor import attribution_scores
from tapclip_tpu.models.prompt_adjustor import adjust_prompt, init_adjustor_params
from tapclip_tpu.models.prompt_learner import PromptBank, PromptLearner, build_prompts

NEG_INF = -1e9


def init_trainable(
    key: jax.Array, prompt_learner: PromptLearner, prompt_cfg: PromptConfig
) -> Dict[str, Any]:
    """Trainable pytree: context bank + adjustor MLP (if any) + logit scale.

    Matches the reference's optimized set: ``AdamW`` over
    ``model.prompt_learner.parameters()`` only (``train.py:65-67``) plus the
    ``logit_scale`` parameter (``model_wrapper.py:26``; frozen in practice
    since the optimizer only sees prompt params — we expose it so training
    configs can choose).
    """
    out = {
        "ctx": prompt_learner.bank.ctx,
        "adjustor": init_adjustor_params(
            key,
            prompt_cfg.adjustor_method,
            prompt_learner.clip_cfg.text_width,
            prompt_cfg.adjustor_hidden,
        ),
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
    }
    if prompt_cfg.image_conditioned:
        E = prompt_learner.clip_cfg.embed_dim
        D = prompt_learner.clip_cfg.text_width
        h = prompt_cfg.meta_hidden or max(E // 16, 8)
        k1, _ = jax.random.split(key)
        # Zero-init the output layer: the conditioned model starts exactly
        # equal to the unconditioned one and learns the shift from there.
        out["meta_net"] = {
            "w1": jax.random.normal(k1, (E, h), jnp.float32) * (E ** -0.5),
            "b1": jnp.zeros((h,), jnp.float32),
            "w2": jnp.zeros((h, D), jnp.float32),
            "b2": jnp.zeros((D,), jnp.float32),
        }
    if prompt_cfg.maple_depth > 0:
        cfg = prompt_learner.clip_cfg
        J = prompt_cfg.maple_depth
        if prompt_cfg.image_conditioned:
            raise NotImplementedError(
                "maple_depth does not compose with image_conditioned "
                "(both re-route the prompt pipeline)"
            )
        if cfg.vision_tower == "resnet":
            raise NotImplementedError(
                "maple_depth requires a ViT vision tower "
                "(vision prompts are token insertions)"
            )
        if J > min(cfg.text_layers, cfg.vision_layers):
            raise ValueError(
                f"maple_depth={J} exceeds the tower depth "
                f"(text {cfg.text_layers}, vision {cfg.vision_layers})"
            )
        D = cfg.text_width
        P = prompt_cfg.prompt_len
        kt, kp = jax.random.split(jax.random.fold_in(key, 7))
        # Deep shared text prompts (layers 1..J-1) + per-layer Dt->Wv
        # projections producing the coupled vision prompts (MaPLe's F_k).
        out["maple"] = {
            "txt": 0.02 * jax.random.normal(kt, (J - 1, P, D), jnp.float32),
            "proj_w": jax.random.normal(kp, (J, D, cfg.vision_width), jnp.float32)
            * (D ** -0.5),
            "proj_b": jnp.zeros((J, cfg.vision_width), jnp.float32),
        }
    return out


def meta_net_forward(p: Dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """CoCoOp-style bottleneck: [B, E] L2-normalized image feature -> [B, D]
    per-sample context shift."""
    h = jax.nn.relu(feats.astype(jnp.float32) @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]


def _tile_bank(bank: PromptBank, B: int) -> PromptBank:
    """Repeat the class axis per sample: [C, ...] -> [B·C, ...]."""
    C = bank.ctx.shape[0]

    def rep(a):
        return jnp.broadcast_to(a[None], (B,) + a.shape).reshape((B * C,) + a.shape[1:])

    return PromptBank(
        ctx=rep(bank.ctx),
        token_embs=rep(bank.token_embs),
        class_mask=rep(bank.class_mask),
        eot_pos=rep(bank.eot_pos),
    )


def text_features_with_attribution(
    clip_params,
    ctx: jnp.ndarray,  # [C, P, D]
    bank: PromptBank,
    clip_cfg: CLIPConfig,
    prompt_cfg: PromptConfig,
    adjustor_params: Dict[str, Any],
    deep_ctx=None,
):
    """Class-batched attribution -> adjust -> encode. Returns (feats, attribution).

    ``deep_ctx`` (MaPLe): ``(prompts [n_text_layers-1, P, D], mask)`` deep
    shared text prompts overwriting the context slots at every masked
    block input — stop-gradient'ed in the attribution pass (like the
    context itself), live in the encoding pass.

    feats: [C, embed_dim] L2-normalized; attribution: [C, P] f32.

    Both text passes run the fused kernels whether or not the caller
    differentiates: every kernel on this path has a dedicated Pallas
    backward (``ops/fused_mha.py::_mha_bwd_kernel``,
    ``ops/flash_attention.py::_attn_bwd_kernel``), so training no longer
    needs an XLA escape.  The attribution pass is stop-gradient'ed (the
    reference detaches it, clip_wrapper.py:36).
    """
    P = prompt_cfg.prompt_len
    mode = prompt_cfg.text_mode
    encode_impl = None
    dp_attr = {}
    dp_enc = {}
    if deep_ctx is not None:
        dp, dpm = deep_ctx
        dp_attr = dict(
            deep_prompts=jax.lax.stop_gradient(dp), deep_prompt_mask=dpm
        )
        dp_enc = dict(deep_prompts=dp, deep_prompt_mask=dpm)

    if mode == "ref_compat":
        # [ctx || full-77-token-embedding] -> 82-token sequence
        # (prompt_learner.py:62-65); attribution column and pooling position
        # are both T-1 (attribution_monitor.py:26-29, model_wrapper.py:73).
        token_embs = bank.token_embs
        seq = build_prompts(jax.lax.stop_gradient(ctx), token_embs)
        T = seq.shape[1]
        _, aux = clip_model.text_forward_embeds(
            clip_params, clip_cfg, seq, mode="ref_compat", attn_to_idx=T - 1,
            **dp_attr,
        )
        attribution = jax.lax.stop_gradient(
            attribution_scores(aux, P, prompt_cfg.normalize_attribution)
        )
        adjusted_ctx = adjust_prompt(adjustor_params, prompt_cfg.adjustor_method, ctx, attribution)
        seq2 = build_prompts(adjusted_ctx, token_embs)
        feats, _ = clip_model.text_forward_embeds(
            clip_params, clip_cfg, seq2, mode="ref_compat", pool_idx=T - 1,
            impl=encode_impl, **dp_enc,
        )
    elif mode == "idiomatic":
        # CoOp-style: [sot, ctx(P), template tokens 1..77-P-1]; positional
        # embedding + causal mask + ln_final; EOT pooling & attribution column
        # at the (shifted) per-class EOT position.
        token_embs = bank.token_embs
        Tctx = clip_cfg.context_length
        seq = jnp.concatenate(
            [
                token_embs[:, :1].astype(ctx.dtype),
                ctx,
                token_embs[:, 1 : Tctx - P].astype(ctx.dtype),
            ],
            axis=1,
        )  # [C, 77, D]
        eot = jnp.minimum(bank.eot_pos + P, Tctx - 1)
        _, aux = clip_model.text_forward_embeds(
            clip_params,
            clip_cfg,
            jax.lax.stop_gradient(seq),
            mode="idiomatic",
            attn_to_idx=eot,
            **dp_attr,
        )
        # ctx occupies query positions 1..P+1.
        attribution = jax.lax.stop_gradient(
            attribution_scores(aux[:, 1 : P + 1], P, prompt_cfg.normalize_attribution)
        )
        adjusted_ctx = adjust_prompt(adjustor_params, prompt_cfg.adjustor_method, ctx, attribution)
        seq2 = jnp.concatenate(
            [
                token_embs[:, :1].astype(ctx.dtype),
                adjusted_ctx,
                token_embs[:, 1 : Tctx - P].astype(ctx.dtype),
            ],
            axis=1,
        )
        feats, _ = clip_model.text_forward_embeds(
            clip_params, clip_cfg, seq2, mode="idiomatic", pool_idx=eot,
            impl=encode_impl, **dp_enc,
        )
    else:
        raise ValueError(f"unknown text mode {mode!r}")

    feats = clip_model.l2_normalize(feats)
    return feats, attribution


@functools.partial(
    jax.jit,
    static_argnames=("clip_cfg", "prompt_cfg", "with_loss", "return_text_feats"),
)
def full_model_forward(
    clip_params,
    trainable: Dict[str, Any],
    bank: PromptBank,
    images: Optional[jnp.ndarray],
    labels: Optional[jnp.ndarray],
    *,
    clip_cfg: CLIPConfig,
    prompt_cfg: PromptConfig,
    with_loss: bool = False,
    image_feats: Optional[jnp.ndarray] = None,
    batch_mask: Optional[jnp.ndarray] = None,
    return_text_feats: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The fused forward (reference FullModel.forward, model_wrapper.py:28-100).

    Either ``images [B,H,W,3]`` or precomputed ``image_feats [B,E]``
    (unnormalized) must be given; the image tower is frozen, so callers may
    cache features across epochs — numerically identical, massively cheaper.
    """
    deep_ctx = None
    if prompt_cfg.maple_depth > 0:
        # MaPLe: the vision tower sees prompts PROJECTED from the live text
        # prompts, so its features depend on the trainable state — cached
        # features would silently freeze the coupling.
        if image_feats is not None:
            raise ValueError(
                "maple_depth makes the vision tower prompt-dependent: "
                "pass raw images, not cached image_feats"
            )
        mp = trainable["maple"]
        J = prompt_cfg.maple_depth
        ctx32 = trainable["ctx"].astype(jnp.float32)
        m = bank.class_mask.astype(jnp.float32)
        # Layer-0 "shared" text prompts = class-masked mean of the per-class
        # TAP context (identical to every row at template init, the paper's
        # shared-ctx behavior; stays coupled to the tuned context after).
        t0 = jnp.einsum("cpd,c->pd", ctx32, m) / jnp.maximum(m.sum(), 1.0)
        t_all = jnp.concatenate([t0[None], mp["txt"]], axis=0)  # [J, P, D]
        v_all = (
            jnp.einsum("jpd,jdw->jpw", t_all, mp["proj_w"])
            + mp["proj_b"][:, None, :]
        )  # [J, P, Wv]
        n_lv = clip_cfg.vision_layers - 1
        v_deep = v_mask = None
        if J > 1 and n_lv > 0:
            v_deep = jnp.pad(v_all[1:], [(0, n_lv - (J - 1)), (0, 0), (0, 0)])
            v_mask = jnp.arange(n_lv) < (J - 1)
        image_feats = clip_model.encode_image(
            clip_params, clip_cfg, images,
            maple_prompts=(v_all[0], v_deep, v_mask),
        )
        n_lt = clip_cfg.text_layers - 1
        if J > 1 and n_lt > 0:
            t_deep = jnp.pad(mp["txt"], [(0, n_lt - (J - 1)), (0, 0), (0, 0)])
            deep_ctx = (t_deep, jnp.arange(n_lt) < (J - 1))
    if image_feats is None:
        image_feats = clip_model.encode_image(clip_params, clip_cfg, images)
    img = clip_model.l2_normalize(image_feats)  # model_wrapper.py:41

    scale = jnp.exp(trainable["logit_scale"]).astype(jnp.float32)
    if prompt_cfg.image_conditioned:
        # CoCoOp-style: every sample shifts the context tokens by a
        # projection of its image feature; the text/attribution pass runs
        # per (sample, class) and attribution becomes genuinely per-sample
        # ([B, C, P] — the reference's per-sample shape, which its
        # image-independent prompts collapse to identical rows).
        B = img.shape[0]
        C, P, D = trainable["ctx"].shape
        pi = meta_net_forward(trainable["meta_net"], img)  # [B, D]
        ctx_bc = (
            trainable["ctx"][None].astype(jnp.float32)
            + pi[:, None, None, :]
        ).astype(trainable["ctx"].dtype)
        text_feats, attribution = text_features_with_attribution(
            clip_params,
            ctx_bc.reshape(B * C, P, D),
            _tile_bank(bank, B),
            clip_cfg,
            prompt_cfg,
            trainable["adjustor"],
        )
        attribution = attribution.reshape(B, C, P)
        logits = scale * jnp.einsum(
            "be,bce->bc",
            img.astype(jnp.float32),
            text_feats.reshape(B, C, -1).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    else:
        text_feats, attribution = text_features_with_attribution(
            clip_params,
            trainable["ctx"],
            bank,
            clip_cfg,
            prompt_cfg,
            trainable["adjustor"],
            deep_ctx=deep_ctx,
        )
        logits = scale * jnp.einsum(
            "be,ce->bc",
            img.astype(jnp.float32),
            text_feats.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # model_wrapper.py:79-83
    logits = jnp.where(bank.class_mask[None, :], logits, NEG_INF)

    out = {"logits": logits, "attribution": attribution}
    if return_text_feats:
        # [C, E] (or [B, C, E] image-conditioned), L2-normalized — for loss
        # terms over the class embeddings (e.g. the KgCoOp anchor).
        out["text_feats"] = (
            text_feats.reshape(img.shape[0], -1, text_feats.shape[-1])
            if prompt_cfg.image_conditioned
            else text_feats
        )
    if with_loss:
        lse = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
        ce = lse - ll
        if batch_mask is not None:
            m = batch_mask.astype(jnp.float32)
            loss = (ce * m).sum() / jnp.maximum(m.sum(), 1.0)
        else:
            loss = ce.mean()
        out["loss"] = loss  # model_wrapper.py:91-93: CE only
        out["loss_cls"] = loss
    return out


class FullModel:
    """User-facing wrapper with the reference's object API.

    ``FullModel(images, labels) -> {"logits", "loss", "loss_cls"}``
    (model_wrapper.py:28-100), backed by the jitted functional core.
    """

    def __init__(
        self,
        class_names: Sequence[str],
        clip_params,
        clip_cfg: CLIPConfig,
        *,
        prompt_cfg: Optional[PromptConfig] = None,
        tokenizer=None,
        attr_lambda: float = 1.0,
        stab_lambda: float = 0.1,
        rng: Optional[jax.Array] = None,
    ):
        from tapclip_tpu.data.tokenizer import get_tokenizer

        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.prompt_cfg = prompt_cfg or PromptConfig()
        self.tokenizer = tokenizer or get_tokenizer()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        self.prompt_learner = PromptLearner(
            class_names,
            clip_params,
            clip_cfg,
            self.prompt_cfg,
            self.tokenizer,
            rng=r1,
        )
        self.trainable = init_trainable(r2, self.prompt_learner, self.prompt_cfg)
        # Accepted-and-unused, mirroring model_wrapper.py:24-25.
        self.attr_lambda = attr_lambda
        self.stab_lambda = stab_lambda

    @property
    def class_names(self):
        return self.prompt_learner.class_names

    @property
    def n_cls(self) -> int:
        return self.prompt_learner.n_cls

    def add_class_prompt(self, name: str) -> None:
        """Seen->unseen expansion (test_cross_domain.py:65-67).

        The new class's context row takes the fresh template init; previously
        trained rows are untouched.
        """
        if name in self.class_names:
            return
        idx = self.n_cls
        self.prompt_learner.add_class_prompt(name)
        bank_ctx = self.prompt_learner.bank.ctx
        ctx = self.trainable["ctx"]
        if ctx.shape[0] < bank_ctx.shape[0]:
            pad = bank_ctx.shape[0] - ctx.shape[0]
            ctx = jnp.pad(ctx, [(0, pad), (0, 0), (0, 0)])
        ctx = ctx.at[idx].set(bank_ctx[idx])
        self.trainable = dict(self.trainable, ctx=ctx)

    def __call__(self, images, labels=None):
        bank = self._bank_with_trained_ctx()
        out = full_model_forward(
            self.clip_params,
            self.trainable,
            bank,
            jnp.asarray(images),
            None if labels is None else jnp.asarray(labels),
            clip_cfg=self.clip_cfg,
            prompt_cfg=self.prompt_cfg,
            with_loss=labels is not None,
        )
        out = dict(out)
        out["logits"] = out["logits"][:, : self.n_cls]
        if out["attribution"].ndim == 3:  # image-conditioned: [B, C, P]
            out["attribution"] = out["attribution"][:, : self.n_cls]
        else:
            out["attribution"] = out["attribution"][: self.n_cls]
        return out

    def predict(self, images):
        """Convenience inference: images -> (pred indices, class names)."""
        import numpy as np

        logits = np.asarray(self(images)["logits"])
        preds = logits.argmax(axis=-1)
        return preds, [self.class_names[i] for i in preds]

    def _bank_with_trained_ctx(self) -> PromptBank:
        return self.prompt_learner.bank
