"""Configuration system for tapclip_tpu.

The reference hardcodes every knob as local variables inside its drivers
(``/root/reference/train.py:29-39``, ``/root/reference/test_cross_domain.py:20-30``,
``/root/reference/test_cross_domain2.py:48-58``).  Here every knob is a frozen
dataclass so configs are hashable (usable as jit static args) and serializable.

Presets mirror the five BASELINE.json configs plus the reference's hardcoded
training config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

# CLIP preprocessing constants (OpenAI CLIP / open_clip defaults).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPConfig:
    """Architecture of a CLIP two-tower model.

    Mirrors the model the reference wraps (open_clip ``ViT-B-32``,
    ``/root/reference/models/clip_wrapper.py:10-15``) but is a from-scratch
    TPU-native implementation.
    """

    name: str = "ViT-B-32"
    # Vision tower: "vit" (default) or "resnet" (CLIP ModifiedResNet — the
    # RN50 family the reference's CLIPWrapper interface also accepts).
    vision_tower: str = "vit"
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # Bottleneck-block counts per stage (resnet towers only; e.g. RN50 is
    # (3, 4, 6, 3) at vision_width 64).
    resnet_layers: tuple = ()
    # Text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # Joint embedding
    embed_dim: int = 512
    # MLP expansion ratio (CLIP uses 4x)
    mlp_ratio: int = 4
    # Activation: "gelu" (laion weights) or "quick_gelu" (OpenAI weights)
    act: str = "gelu"
    ln_eps: float = 1e-5
    # Compute dtype for the towers ("bfloat16" on TPU, "float32" for tests).
    dtype: str = "float32"
    # Attention implementation: "auto" | "xla" | "pallas"
    attn_impl: str = "auto"
    # Attention-aware token pruning for the (frozen) vision tower: after
    # `token_prune_layer` blocks, keep the class token plus the patches with
    # the highest class-query attention. 1.0 = exact (off). Inference
    # acceleration in the spirit of the retrieved token-filtering papers
    # (PAPERS.md); an approximation — eval-quality tradeoff is the user's.
    token_keep_ratio: float = 1.0
    token_prune_layer: int = 4
    # int8 (W8A8, stochastic-rounding activations) frozen-tower path —
    # MLP (ops/int8_mlp.py) + attention projections (ops/int8_attn.py).
    # Valid for eval AND prompt-tune training (the frozen tower is off the
    # autodiff path); full-tower pretraining must not enable it (no VJP).
    # ViT towers only; the RN family raises NotImplementedError.
    quantize_tower: bool = False
    # Force the deterministic (round-to-nearest) int8 model everywhere, on
    # every platform: reproducible production scoring at some throughput
    # cost (the stochastic-rounding Pallas kernels are bypassed). Only
    # meaningful with quantize_tower=True.
    int8_deterministic: bool = False
    # Rematerialization (gradient checkpointing) for the transformer blocks,
    # relevant only when the towers themselves are differentiated (full-tower
    # pretraining; prompt tuning never differentiates them):
    #   "none" — save all residuals (default; fastest at small batch),
    #   "dots" — save matmul outputs, recompute elementwise/LN/softmax,
    #   "full" — save only block inputs, recompute everything in backward.
    # Trades ~1 extra forward of FLOPs ("full") for activation memory, which
    # is what bounds the pretraining batch size.
    remat: str = "none"
    # lax.scan unroll factor for the transformer block stacks. 1 = rolled
    # (default; smallest program). Full unroll (>= n_layers) measured ~7%
    # faster for grad-of-scan at ViT-B pretraining geometry (the scan's
    # per-iteration carry save/restore disappears and XLA schedules across
    # layer boundaries); compile time grows with the unroll factor.
    scan_unroll: int = 1
    # Mixture-of-experts MLPs for the transformer towers (LIMoE-style CLIP
    # scaling; models/moe.py). 0 = dense (default). When > 0, every block's
    # MLP becomes a Switch-style top-1-routed expert bank with static
    # per-sequence capacity — expert weights shard over the "model" mesh
    # axis (expert parallelism). ViT towers only.
    moe_experts: int = 0
    # Static per-group token capacity multiplier: each expert accepts up to
    # ceil(T/E * factor) tokens per sequence (rounded to a sublane multiple);
    # overflow tokens pass through the residual unchanged (standard Switch
    # semantics, keeps every shape static for XLA).
    moe_capacity_factor: float = 1.25
    # Weight on the Switch load-balancing auxiliary loss added by the
    # pretraining step (prompt tuning freezes the towers and ignores it).
    moe_aux_weight: float = 0.01
    # FLIP-style patch dropout for PRETRAINING (Li et al., "Scaling
    # Language-Image Pre-training via Masking"): drop this fraction of the
    # vision patch tokens (class token always kept) per sample per step,
    # AFTER the positional embedding, BEFORE ln_pre (open_clip placement).
    # Active only when the caller passes an rng into encode_image (the
    # pretrain step does under --patch-dropout); eval paths never drop.
    # Cuts vision-tower FLOPs ~proportionally — the published recipe masks
    # 50% for ~2x faster pretraining at near-equal zero-shot accuracy.
    patch_dropout: float = 0.0
    # VPT-Shallow (Jia et al., "Visual Prompt Tuning"): this many learnable
    # prompt tokens are inserted after the class token at the vision tower
    # input (positions 1..P, patches shift right). The vision-side analogue
    # of the reference's text prompt tuning — pair with pretrain_cli's
    # --lock-image-tower for the standard "frozen backbone + visual
    # prompts" fine-tune (the VPT tokens stay trainable through a lock).
    # ViT towers only; 0 = off.
    vpt_tokens: int = 0
    # VPT-Deep: fresh learned prompts at EVERY block input (the paper's
    # stronger variant) — `visual.vpt` becomes [n_layers, P, W]; row 0 is
    # inserted at the tower input, rows 1..L-1 overwrite the prompt slots
    # at each subsequent block input inside the scan. Requires the
    # sequential block runner (no pipeline/MoE override).
    vpt_deep: bool = False

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def vision_seq_len(self) -> int:
        return self.num_patches + 1  # + class token

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "CLIPConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Model presets
# ---------------------------------------------------------------------------

VIT_B_32 = CLIPConfig(name="ViT-B-32")
VIT_B_16 = CLIPConfig(name="ViT-B-16", patch_size=16)
VIT_L_14 = CLIPConfig(
    name="ViT-L-14",
    patch_size=14,
    vision_width=1024,
    vision_layers=24,
    vision_heads=16,
    text_width=768,
    text_layers=12,
    text_heads=12,
    embed_dim=768,
)
# The high-resolution fine-tune OpenAI ships alongside ViT-L/14: identical
# towers, 336px input (24x24 patch grid + cls = 577 tokens -> Tp=584).
VIT_L_14_336 = VIT_L_14.replace(name="ViT-L-14-336", image_size=336)

RN50 = CLIPConfig(
    name="RN50",
    vision_tower="resnet",
    vision_width=64,
    resnet_layers=(3, 4, 6, 3),
    embed_dim=1024,
)
RN101 = CLIPConfig(
    name="RN101",
    vision_tower="resnet",
    vision_width=64,
    resnet_layers=(3, 4, 23, 3),
    embed_dim=512,
)
# EfficientNet-style scaled RN50 variants (open_clip geometry: width, depth
# and input resolution scale together; attnpool heads derive from width).
RN50x4 = CLIPConfig(
    name="RN50x4",
    vision_tower="resnet",
    vision_width=80,
    resnet_layers=(4, 6, 10, 6),
    image_size=288,
    embed_dim=640,
    text_width=640,
    text_heads=10,
)
RN50x16 = CLIPConfig(
    name="RN50x16",
    vision_tower="resnet",
    vision_width=96,
    resnet_layers=(6, 8, 18, 8),
    image_size=384,
    embed_dim=768,
    text_width=768,
    text_heads=12,
)
RN50x64 = CLIPConfig(
    name="RN50x64",
    vision_tower="resnet",
    vision_width=128,
    resnet_layers=(3, 15, 36, 10),
    image_size=448,
    embed_dim=1024,
    text_width=1024,
    text_heads=16,
)

# A tiny config for unit tests / multichip dry runs (fast init + compile).
TINY_TEST = CLIPConfig(
    name="tiny-test",
    image_size=32,
    patch_size=16,
    vision_width=64,
    vision_layers=2,
    vision_heads=4,
    # >= the byte-level fallback tokenizer's 514-entry vocab.
    vocab_size=520,
    context_length=16,
    text_width=64,
    text_layers=2,
    text_heads=4,
    embed_dim=32,
)

MODEL_PRESETS = {
    "ViT-B-32": VIT_B_32,
    "ViT-B-16": VIT_B_16,
    "ViT-L-14": VIT_L_14,
    "ViT-L-14-336": VIT_L_14_336,
    "RN50": RN50,
    "RN101": RN101,
    "RN50x4": RN50x4,
    "RN50x16": RN50x16,
    "RN50x64": RN50x64,
    "tiny-test": TINY_TEST,
}


@dataclass(frozen=True)
class PromptConfig:
    """Prompt-tuning configuration.

    Matches the reference defaults: ``prompt_len=5`` (``train.py:31``),
    ``class_specific=True`` (``train.py:62``), ``use_init_prompt=True``
    (``prompt_learner.py:7``), scale adjustor (``train.py:61``).
    """

    prompt_len: int = 5
    # Accepted-and-unused beyond the construction banner, exactly like the
    # reference (prompt_learner.py:10,21 — its context bank is per-class
    # unconditionally regardless of this flag).
    class_specific: bool = True
    use_init_prompt: bool = True
    adjustor_method: str = "scale"  # 'scale' | 'gate' | 'residual'
    adjustor_hidden: int = 64  # prompt_adjustor.py:14,22
    template: str = "a photo of a {}"  # prompt_learner.py:31
    # Padded capacity of the class axis; classes can be added dynamically
    # (test_cross_domain.py:65-67) without retracing as long as
    # n_cls <= max_classes.  Grown in chunks when exceeded.
    max_classes: int = 8
    normalize_attribution: bool = True  # attribution_monitor.py:31-34
    # Image-conditioned prompts (CoCoOp-style meta-net): each sample shifts
    # the context tokens by a projection of its image feature, making the
    # attribution per-(sample, class) instead of class-level.  The reference
    # defines attribution per-sample but its prompts are image-independent so
    # all rows coincide (SURVEY.md §3.2); this is the variant where they
    # genuinely differ.  Costs a text pass per (sample, class) pair.
    image_conditioned: bool = False
    meta_hidden: int = 0  # 0 -> embed_dim // 16 (CoCoOp's bottleneck)
    # MaPLe (Khattak et al., CVPR 2023) multi-modal prompt depth J: deep
    # SHARED text prompts overwrite the context slots at text blocks
    # 1..J-1, and per-layer linear projections of the text prompts are
    # inserted as vision prompts (VPT placement) at vision blocks 0..J-1 —
    # the two towers' prompts are coupled, and the VISION tower becomes
    # prompt-dependent (image features cannot be cached while training).
    # 0 disables.  Layer-0's text prompts are the (per-class) TAP context;
    # its vision projection takes the class-masked mean context.
    maple_depth: int = 0
    # "ref_compat": bare text transformer on [ctx || 77-token emb] with no
    #   positional embedding, no causal mask, no ln_final, pool position -1
    #   (model_wrapper.py:58,72-74).
    # "idiomatic": CoOp-style — [sot, ctx, class tokens, eot] with positional
    #   embedding, causal mask, ln_final, EOT pooling.
    text_mode: str = "ref_compat"


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: train.py:29-39)."""

    lr: float = 2e-3
    weight_decay: float = 0.01
    epochs: int = 100
    patience: int = 10
    batch_size: int = 32
    num_shots: int = 5
    seed: int = 0
    attr_lambda: float = 1.0  # accepted-and-unused in reference (model_wrapper.py:24)
    stab_lambda: float = 0.1  # accepted-and-unused in reference (model_wrapper.py:25)
    # KgCoOp (Yao et al., CVPR 2023): anchor the learned text features to the
    # frozen zero-shot classifier with lambda * mean_c(1 - cos(w_c, w_c^zs)).
    # 0.0 (default) keeps the reference's CE-only loss exactly.
    kg_lambda: float = 0.0
    # ProGrad (Zhu et al., ICCV 2023): project the task gradient off the
    # gradient of KL(zero-shot || tuned) whenever the two conflict (paper
    # lambda=1: the update never increases the KL to the frozen zero-shot
    # predictions).  0.0 (default) keeps plain gradient descent.
    prograd_lambda: float = 0.0
    # PromptSRC-style logit self-regularization (Khattak et al. 2023
    # L_SCL-logits): add lambda * KL(zero-shot preds || tuned preds) to the
    # loss — soft distillation from the frozen zero-shot classifier.
    # Combine with kg_lambda (the feature-level term) for the PromptSRC
    # recipe (tapclip_tpu.promptsrc adds the Gaussian prompt aggregation).
    scl_lambda: float = 0.0
    # PromptSRC textual diversity: when non-empty, the frozen zero-shot
    # anchor behind kg/scl/prograd is the renormalized MEAN of the
    # same-pipeline class embeddings over THESE templates (each "... {} ..."
    # with the class name slotted in) instead of the single
    # PromptConfig.template init.  Paper: the frozen text anchor averages
    # many hand-written prompts so the pull targets a template-ensemble
    # manifold point.  NOTE with an ensembled anchor loss_kg is no longer
    # exactly 0 at the template init (the tuned start is template[0] only).
    anchor_templates: Tuple[str, ...] = ()


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. axes: data-parallel x tensor/model-parallel."""

    dp: int = -1  # -1: all remaining devices
    tp: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    model: CLIPConfig = VIT_B_32
    prompt: PromptConfig = PromptConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    class_names: Tuple[str, ...] = (
        "Backpack",
        "Alarm_Clock",
        "Laptop",
        "Pen",
        "Mug",
    )  # train.py:38
    data_root: str = "data/OfficeHomeDataset_10072016/Real World"  # train.py:76
    pretrained_path: Optional[str] = None
    version: str = "main"
    output_root: str = "results"


# The 5 BASELINE.json benchmark configs as presets.
def preset(name: str) -> ExperimentConfig:
    base = ExperimentConfig()
    presets = {
        # 1. Zero-shot CLIP ViT-B/32 eval on OfficeHome Real->Clipart.
        "zeroshot_b32": dataclasses.replace(
            base,
            model=VIT_B_32,
            train=dataclasses.replace(base.train, num_shots=0),
            data_root="data/OfficeHomeDataset_10072016/Clipart",
        ),
        # 2. 16-shot prompt tuning ViT-B/16 on OfficeHome Real.
        "fewshot16_b16": dataclasses.replace(
            base,
            model=VIT_B_16,
            train=dataclasses.replace(base.train, num_shots=16),
        ),
        # 3. Full OfficeHome 4-domain transfer matrix.
        "officehome_matrix": base,
        # 4. DomainNet 345-class few-shot + zero-shot transfer.
        "domainnet": dataclasses.replace(
            base,
            prompt=dataclasses.replace(base.prompt, max_classes=352),
            data_root="data/domainnet",
        ),
        # 5. ViT-L/14 seen->unseen class transfer, batch 1k+.
        "vitl_unseen": dataclasses.replace(
            base,
            model=VIT_L_14,
            train=dataclasses.replace(base.train, batch_size=1024),
        ),
        # Reference train.py config.
        "reference_train": base,
        "tiny": dataclasses.replace(base, model=TINY_TEST),
    }
    if name not in presets:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(presets)}")
    return presets[name]
