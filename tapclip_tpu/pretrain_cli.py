"""CLIP contrastive pretraining driver.

Trains the full CLIP towers with the bidirectional InfoNCE objective
(``tapclip_tpu.pretrain``) on (image, caption) pairs. Captions come from an
ImageFolder tree's class names via a template ("a photo of a {class}") — the
natural supervision available for the OfficeHome/DomainNet layout — or any
callable mapping path -> text.

Negatives span the global batch over the mesh's ``data`` axis (ICI
all_gather). Checkpoints are full-param Orbax trees loadable as pretrained
weights by every other driver.

Usage:
    python -m tapclip_tpu.pretrain_cli --data-root data/OfficeHome/Real\\ World \\
        --model ViT-B-32 --epochs 5 --batch-size 256 --lr 1e-4
    python -m tapclip_tpu.pretrain_cli --preset tiny --synthetic-data --epochs 2
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from tapclip_tpu.config import preset
from tapclip_tpu.train import (
    apply_overrides,
    build_argparser,
    build_model,
    maybe_synthetic_root,
    setup_platform,
)


def _append_metrics_row(path: str, row: dict) -> None:
    """Machine-readable per-epoch training metrics (results/.../csv/),
    alongside the reference-style human logs.

    The schema may grow mid-run (e.g. ``--zeroshot-frequency N`` adds its
    column only on evaluated epochs): when a new key appears, the file is
    rewritten with the union header so every row stays aligned (per-epoch
    files are tiny)."""
    import csv

    rows = []
    fields: list = []
    if os.path.exists(path):
        with open(path, newline="") as f:
            r = csv.DictReader(f)
            fields = list(r.fieldnames or [])
            rows = list(r)
    new_fields = fields + [k for k in row if k not in fields]
    rows.append({k: row.get(k, "") for k in new_fields})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=new_fields, restval="")
        w.writeheader()
        w.writerows(rows)


def main(argv: Optional[List[str]] = None) -> dict:
    p = build_argparser(__doc__)
    p.add_argument("--dp", type=int, default=-1, help="data-parallel mesh size")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages: shard the block stacks "
                        "over a 'pipe' mesh axis (GPipe ppermute schedule, "
                        "parallel/pipeline.py)")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="GPipe microbatch count (default 2*pp)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="Megatron-SP activation layout between blocks "
                        "(requires --tp > 1); numerically a no-op")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO/FSDP: shard params + AdamW moments over the "
                        "data axis (1/dp memory each); weights all-gather "
                        "just-in-time, grads reduce-scatter. Numerically "
                        "identical to plain DP. Not with --pp or "
                        "--lora-rank (both are already memory-light)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="maintain an EMA of the full param tree (open_clip "
                        "model averaging; e.g. 0.999); saved alongside the "
                        "final checkpoint as clip_pretrained_ema. "
                        "Full-tree runs only (ignored with --lora-rank)")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="parameter-efficient fine-tuning: train rank-r LoRA "
                        "adapters on the tower GEMMs instead of the full "
                        "tree (peft.py); the final checkpoint is the MERGED "
                        "weights, loadable via --pretrained everywhere")
    p.add_argument("--lora-alpha", type=float, default=16.0,
                   help="LoRA scaling (merged delta is alpha/r * A@B)")
    p.add_argument("--bitfit", action="store_true",
                   help="BitFit: train ONLY the bias terms (+ logit_scale/"
                        "bias extras) — ~0.1%% of params; frozen weights "
                        "stay bit-identical (pretrain.bitfit_optimizer)")
    p.add_argument("--scan-unroll", type=int, default=0,
                   help="lax.scan unroll for the block stacks (0 = rolled; "
                        "n_layers = full unroll, measured ~4%% faster "
                        "full-step at ViT-B pretraining geometry at the "
                        "cost of compile time)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="mixture-of-experts MLPs with this many experts per "
                        "block (models/moe.py); expert axis shards over the "
                        "'model' mesh axis (expert parallelism)")
    p.add_argument("--distill-teacher", default=None,
                   help="knowledge distillation (distill.py): path to a "
                        "frozen teacher checkpoint (Orbax dir from this CLI, "
                        "or an open_clip .bin/.pt); the run trains the "
                        "student (--model) against it with task + KD-KL + "
                        "feature-mimicry losses")
    p.add_argument("--teacher-model", default=None,
                   help="teacher preset name (MODEL_PRESETS key, e.g. "
                        "ViT-L-14); defaults to the student's --model")
    p.add_argument("--kd-temp", type=float, default=1.0,
                   help="distillation temperature over each model's own "
                        "calibrated logits")
    p.add_argument("--task-weight", type=float, default=1.0,
                   help="weight of the student's own InfoNCE term")
    p.add_argument("--kd-weight", type=float, default=1.0,
                   help="weight of the KD KL(teacher||student) term")
    p.add_argument("--feat-weight", type=float, default=1.0,
                   help="weight of the feature-mimicry term")
    p.add_argument("--shard-dir", default=None,
                   help="stream (image, caption) pairs from webdataset .tar "
                        "shards under this directory (data/shards.py) "
                        "instead of an ImageFolder; captions come from the "
                        "shards, multihost ranks stream disjoint shard "
                        "subsets, resume is shard-granular")
    p.add_argument("--shuffle-buffer", type=int, default=1000,
                   help="sample shuffle-buffer size for --shard-dir")
    # --uint8-transfer comes from the shared build_argparser (train.py);
    # here it switches all pretraining loaders to uint8 transport batches.
    p.add_argument("--fast-decode", action="store_true",
                   help="DCT-scaled JPEG decode in the native pipeline "
                        "(PIL draft semantics: IDCT emits at <=1/2 scale "
                        "when the source is large enough; ~2x decode "
                        "throughput on web-size JPEGs, near- but not "
                        "bit-identical pixels)")
    p.add_argument("--csv-path", default=None,
                   help="CSV/TSV manifest of (image path, caption) rows — "
                        "the open_clip csv training format "
                        "(data/csv_dataset.py); relative paths resolve "
                        "against the manifest's directory")
    p.add_argument("--csv-img-key", default="filepath",
                   help="image-path column name (open_clip default)")
    p.add_argument("--csv-caption-key", default="title",
                   help="caption column name (open_clip default)")
    p.add_argument("--csv-sep", default="\t",
                   help="column delimiter (default: tab)")
    p.add_argument("--zeroshot-val-root", default=None,
                   help="labeled ImageFolder for per-epoch ZERO-SHOT "
                        "accuracy validation (open_clip's "
                        "--zeroshot-frequency pattern): class-name "
                        "template classifier rebuilt from the live "
                        "weights each time")
    p.add_argument("--zeroshot-frequency", type=int, default=1,
                   help="evaluate zero-shot accuracy every N epochs")
    p.add_argument("--val-shard-dir", default=None,
                   help="webdataset shards of held-out (image, caption) "
                        "pairs: per-epoch contrastive val loss + retrieval "
                        "Recall@1/5/10 (the open_clip validation readout); "
                        "evaluates the EMA tree too under --ema-decay")
    p.add_argument("--val-samples", type=int, default=1024,
                   help="cap on pooled validation pairs per epoch")
    p.add_argument("--template", default="a photo of a {}")
    p.add_argument("--sharded-snapshot", action="store_true",
                   help="save --save-every snapshots with Orbax's sharded "
                        "writer: leaves stream from their devices (no host "
                        "gather of the FSDP/TP-sharded params + moments) "
                        "and --resume restores straight into the current "
                        "mesh layout, resharding if the topology changed")
    p.add_argument("--schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="LR schedule: constant (reference-style) or linear "
                        "warmup + cosine decay to zero over the run "
                        "(open_clip-style)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear warmup steps (cosine schedule)")
    p.add_argument("--lock-image-tower", action="store_true",
                   help="LiT-style fine-tuning: freeze the image tower "
                        "(multi_transform routes it to set_to_zero — no "
                        "updates/weight decay; full locks also stop_gradient "
                        "the tower, pruning its backward pass); train the "
                        "text tower + logit_scale only")
    p.add_argument("--lock-text-tower", action="store_true",
                   help="freeze the text tower; train the image tower + "
                        "logit_scale only")
    p.add_argument("--lock-unlocked-groups", type=int, default=0,
                   help="with --lock-*-tower: keep the LAST N tower groups "
                        "trainable (open_clip unlocked_groups; groups = "
                        "[stem, block_0..block_{L-1}, head]; 1 = head only)")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--remat", default=None, choices=["none", "dots", "full"],
                   help="per-block gradient checkpointing for the towers "
                        "(CLIPConfig.remat): trade recompute FLOPs for "
                        "activation memory so batch can scale")
    p.add_argument("--loss", default="infonce", choices=["infonce", "siglip"],
                   help="contrastive objective: softmax InfoNCE or the "
                        "SigLIP pairwise sigmoid (ppermute-ring sharded)")
    p.add_argument("--patch-dropout", type=float, default=0.0,
                   help="FLIP masking: drop this fraction of vision patch "
                        "tokens per sample per step (class token kept) — "
                        "~proportional vision-FLOP cut; 0.5 is the "
                        "published ~2x-speedup recipe")
    p.add_argument("--vpt-tokens", type=int, default=0,
                   help="VPT-Shallow: insert N learnable prompt tokens into "
                        "the vision sequence (CLIPConfig.vpt_tokens); they "
                        "stay trainable through --lock-image-tower — the "
                        "standard frozen-backbone visual-prompt fine-tune")
    p.add_argument("--vpt-deep", action="store_true",
                   help="VPT-Deep: fresh learned prompts at EVERY block "
                        "input (requires --vpt-tokens; sequential scan only)")
    p.add_argument("--augment", action="store_true",
                   help="on-device per-sample RandomResizedCrop of every "
                        "train batch (data/augment.py; open_clip-style "
                        "scale range, see --aug-scale-min/--hflip)")
    p.add_argument("--aug-scale-min", type=float, default=0.9,
                   help="lower bound of the crop-area fraction "
                        "(open_clip default 0.9; torchvision-style 0.08)")
    p.add_argument("--hflip", type=float, default=0.0,
                   help="horizontal-flip probability under --augment")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: one optimizer update every K "
                        "micro-batches (K x the effective batch for the "
                        "gradient; contrastive negatives stay per-micro-batch)")
    p.add_argument("--accum-full-negatives", type=int, default=1,
                   help="GradCache / open_clip accum-freq accumulation: one "
                        "update every K micro-batches with contrastive "
                        "negatives spanning the FULL K x batch (exact KxB "
                        "objective at one-micro-batch activation memory; "
                        "~1.3x step time for the extra forward)")
    # --save-every / --resume come from the shared build_argparser; here they
    # snapshot/restore (params, opt_state, epoch) of the PRETRAINING run.
    args = p.parse_args(argv)
    setup_platform(args.platform)
    cfg = apply_overrides(preset(args.preset), args)
    if (args.remat or args.moe_experts or args.scan_unroll
            or args.patch_dropout or args.vpt_tokens or args.vpt_deep):
        import dataclasses

        model_cfg = cfg.model
        if args.remat:
            model_cfg = model_cfg.replace(remat=args.remat)
        if args.moe_experts:
            model_cfg = model_cfg.replace(moe_experts=args.moe_experts)
        if args.scan_unroll:
            model_cfg = model_cfg.replace(scan_unroll=args.scan_unroll)
        if args.patch_dropout:
            model_cfg = model_cfg.replace(patch_dropout=args.patch_dropout)
        if args.vpt_tokens:
            model_cfg = model_cfg.replace(
                vpt_tokens=args.vpt_tokens, vpt_deep=args.vpt_deep
            )
        elif args.vpt_deep:
            raise ValueError("--vpt-deep requires --vpt-tokens N")
        cfg = dataclasses.replace(cfg, model=model_cfg)

    import jax
    import jax.numpy as jnp
    import optax

    from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader
    from tapclip_tpu.parallel.mesh import make_mesh
    from tapclip_tpu.parallel.sharding import (
        replicate, shard_batch, shard_opt_state, shard_params,
    )
    from tapclip_tpu.pretrain import add_siglip_params, make_pretrain_step
    from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint
    from tapclip_tpu.utils.logging_utils import generate_output_paths, setup_logging
    from tapclip_tpu.zero_shot import class_name_to_text

    paths = generate_output_paths(cfg.version + "_pretrain", cfg.output_root)
    log = setup_logging(os.path.join(paths["log_dir"], "pretrain.log"))

    model, preprocess = build_model(cfg, bpe_path=args.bpe_path)
    params = model.clip_params
    tokenizer = model.tokenizer

    caption_ids = None
    if args.shard_dir and args.csv_path:
        raise ValueError("--shard-dir and --csv-path are exclusive")
    if args.csv_path:
        # open_clip-style CSV manifest: loose image files + captions.
        from tapclip_tpu.data.csv_dataset import CsvLoader

        loader = CsvLoader(
            args.csv_path,
            cfg.train.batch_size,
            tokenize=lambda caps: np.asarray(
                tokenizer.tokenize(caps, cfg.model.context_length)
            ),
            image_size=cfg.model.image_size,
            img_key=args.csv_img_key,
            caption_key=args.csv_caption_key,
            sep=args.csv_sep,
            seed=cfg.train.seed,
            rank=jax.process_index(),
            world=jax.process_count(),
            fast_decode=args.fast_decode,
            output_dtype="uint8" if args.uint8_transfer else "float32",
        )
        log.info(
            "streaming %d image-text pairs from %s (rank %d/%d)",
            loader.num_samples, args.csv_path,
            jax.process_index(), jax.process_count(),
        )
    elif args.shard_dir:
        # Webdataset tar-shard streaming (data/shards.py): real image-text
        # pairs, captions from the shards, jit-ready batches out.
        from tapclip_tpu.data.shards import ShardLoader, list_shards

        loader = ShardLoader(
            list_shards(args.shard_dir),
            cfg.train.batch_size,
            tokenize=lambda caps: np.asarray(
                tokenizer.tokenize(caps, cfg.model.context_length)
            ),
            image_size=cfg.model.image_size,
            shuffle_buffer=args.shuffle_buffer,
            seed=cfg.train.seed,
            rank=jax.process_index(),
            world=jax.process_count(),
            fast_decode=args.fast_decode,
            output_dtype="uint8" if args.uint8_transfer else "float32",
        )
        log.info(
            "streaming %d image-text pairs from %d tar shards "
            "(rank %d/%d, shuffle buffer %d)",
            loader.num_samples, len(loader.shards),
            jax.process_index(), jax.process_count(), args.shuffle_buffer,
        )
    else:
        data_root = maybe_synthetic_root(cfg, args.synthetic_data)
        index = ImageFolderIndex.scan(data_root)
        # caption per sample from its class name
        idx_to_name = {v: k for k, v in index.class_to_idx.items()}
        caption_ids = {
            raw: tokenizer.tokenize(
                [args.template.format(class_name_to_text(name))],
                cfg.model.context_length,
            )[0]
            for raw, name in idx_to_name.items()
        }
        loader = Loader(
            index.samples,
            cfg.train.batch_size,
            shuffle=True,
            seed=cfg.train.seed,
            image_size=cfg.model.image_size,
            drop_remainder=True,
            output_dtype="uint8" if args.uint8_transfer else "float32",
        )
        log.info("pretraining on %d images, %d classes",
                 len(index.samples), len(idx_to_name))
    del preprocess  # loaders pick the native/PIL default at the right size

    n_dev = len(jax.devices())
    mesh = (
        make_mesh(dp=args.dp, tp=args.tp, pp=args.pp) if n_dev > 1 else None
    )
    if args.fsdp:
        if args.lora_rank > 0:
            raise ValueError("--fsdp does not apply to --lora-rank runs "
                             "(the adapters are KBs; shard nothing)")
        if args.pp > 1:
            raise ValueError("--fsdp does not compose with --pp "
                             "(both spread param/optimizer memory)")
        if mesh is None:
            log.warning("--fsdp ignored: single device, nothing to shard")
    teacher_params = None
    teacher_cfg = None
    if args.distill_teacher:
        if args.lora_rank > 0:
            raise ValueError("--distill-teacher trains the full student "
                             "tree; it does not compose with --lora-rank")
        if args.pp > 1 or args.fsdp:
            raise ValueError("--distill-teacher does not compose with "
                             "--pp/--fsdp yet (dp/tp only)")
        if args.loss == "siglip":
            raise ValueError("--distill-teacher uses the InfoNCE task term; "
                             "drop --loss siglip")
        if args.moe_experts:
            raise ValueError("--distill-teacher with MoE students is not "
                             "wired (the aux loss is not in the KD objective)")
        from tapclip_tpu.config import MODEL_PRESETS

        teacher_cfg = MODEL_PRESETS[args.teacher_model or cfg.model.name]
        if os.path.isdir(args.distill_teacher):
            import orbax.checkpoint as ocp

            teacher_params = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(args.distill_teacher)
            )
        else:
            from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

            teacher_params = load_openclip_checkpoint(
                args.distill_teacher, teacher_cfg
            )
        teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        log.info("distillation: frozen %s teacher from %s (tau=%.2f, "
                 "w_task=%.2f, w_kd=%.2f, w_feat=%.2f)",
                 args.teacher_model or cfg.model.name, args.distill_teacher,
                 args.kd_temp, args.task_weight, args.kd_weight,
                 args.feat_weight)
    if args.schedule == "cosine":
        total_steps = max(len(loader) * cfg.train.epochs, 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.train.lr,
            warmup_steps=min(args.warmup_steps, total_steps - 1),
            decay_steps=total_steps,
            end_value=0.0,
        )
        log.info("cosine schedule: peak %.2e, %d warmup of %d total steps",
                 cfg.train.lr, args.warmup_steps, total_steps)
    else:
        lr = cfg.train.lr
    optimizer = optax.adamw(lr, weight_decay=cfg.train.weight_decay)
    if args.bitfit:
        if args.lora_rank:
            raise ValueError("--bitfit and --lora-rank are both PEFT "
                             "restrictions of the trainable set; pick one")
        if args.lock_image_tower or args.lock_text_tower:
            raise ValueError("--bitfit already freezes every non-bias leaf; "
                             "drop --lock-*-tower")
        from tapclip_tpu.pretrain import bitfit_optimizer

        optimizer = bitfit_optimizer(optimizer)
        log.info("BitFit: training bias terms + extras only")
    if args.lock_image_tower or args.lock_text_tower:
        if args.lora_rank:
            raise ValueError(
                "--lock-*-tower composes oddly with --lora-rank (adapters "
                "already restrict the trainable set); pick one"
            )
        from tapclip_tpu.pretrain import lock_tower_optimizer

        optimizer = lock_tower_optimizer(
            optimizer,
            lock_image=args.lock_image_tower,
            lock_text=args.lock_text_tower,
            unlocked_groups=args.lock_unlocked_groups,
        )
        log.info("locked towers: image=%s text=%s unlocked_groups=%d "
                 "(LiT-style)", args.lock_image_tower, args.lock_text_tower,
                 args.lock_unlocked_groups)
    if args.grad_clip > 0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.grad_clip), optimizer
        )
    if args.accum_steps > 1:
        # One real update every K micro-batches; the MultiSteps state carries
        # the f32 gradient accumulator and survives --save-every snapshots.
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=args.accum_steps)
    if args.loss == "siglip":
        params = add_siglip_params(params)
    if (args.patch_dropout > 0 or args.augment) and (
            args.lora_rank > 0 or args.distill_teacher):
        raise ValueError(
            "--patch-dropout/--augment are wired for the full-tree "
            "pretraining step only (not --lora-rank/--distill-teacher yet)"
        )
    lora = None
    if args.lora_rank > 0:
        if args.pp > 1:
            raise ValueError(
                "--lora-rank does not compose with --pp yet "
                "(the merged tree runs the sequential tower)"
            )
        from tapclip_tpu.peft import init_lora_params, make_lora_pretrain_step

        lora = init_lora_params(
            jax.random.PRNGKey(cfg.train.seed + 1), params, rank=args.lora_rank
        )
        step = make_lora_pretrain_step(
            cfg.model, optimizer, mesh=mesh, loss=args.loss,
            alpha=args.lora_alpha,
        )
        opt_state = optimizer.init(lora)
        from tapclip_tpu.peft import lora_param_count

        log.info("LoRA fine-tuning: rank %d, %d adapter params",
                 args.lora_rank, lora_param_count(lora))
    elif teacher_params is not None:
        from tapclip_tpu.distill import init_distill_params, make_distill_step

        params = init_distill_params(
            jax.random.PRNGKey(cfg.train.seed + 2), params,
            cfg.model.embed_dim, teacher_cfg.embed_dim,
        )
        step = make_distill_step(
            cfg.model, teacher_cfg, optimizer, mesh=mesh,
            tau=args.kd_temp, w_task=args.task_weight,
            w_kd=args.kd_weight, w_feat=args.feat_weight,
        )
        opt_state = optimizer.init(params)
    else:
        augment = None
        if args.augment:
            from tapclip_tpu.data.augment import AugmentConfig

            augment = AugmentConfig(
                scale=(args.aug_scale_min, 1.0), hflip=args.hflip
            )
        if args.accum_full_negatives > 1:
            if (args.accum_steps > 1 or args.pp > 1 or args.fsdp
                    or args.seq_parallel):
                raise ValueError(
                    "--accum-full-negatives composes with dp/tp meshes and "
                    "the stochastic knobs, not with --accum-steps/--pp/"
                    "--fsdp/--seq-parallel"
                )
            from tapclip_tpu.pretrain import make_accum_pretrain_step

            step = make_accum_pretrain_step(
                cfg.model, optimizer, args.accum_full_negatives,
                mesh=mesh, loss=args.loss, augment=augment,
            )
        else:
            full_lock = args.lock_unlocked_groups <= 0
            step = make_pretrain_step(
                cfg.model, optimizer, mesh=mesh, loss=args.loss,
                pp_microbatches=args.pp_microbatches,
                seq_parallel=args.seq_parallel,
                fsdp=args.fsdp and mesh is not None,
                augment=augment,
                lock_image=args.lock_image_tower and full_lock,
                lock_text=args.lock_text_tower and full_lock,
            )
        opt_state = optimizer.init(params)
    start_epoch = 1
    resume_gstep = 0
    def _resume_tail(snap, how):
        """Shared epoch/stream alignment for both resume modes.  Epoch-
        granular: the stream reshuffles per (seed, epoch), so aligning the
        epoch counter reproduces the un-preempted run's shard order for
        every remaining epoch."""
        start = int(snap.get("epoch", 0)) + 1
        if args.shard_dir:
            loader.restore({"epoch": start - 1, "shards_done": 0})
        elif args.csv_path:
            loader.restore({"epoch": start - 1})
        log.info("resumed (%s) from %s (epoch %d)", how, args.resume,
                 start - 1)
        return start, int(snap.get("gstep", 0))

    if args.resume and not args.sharded_snapshot:
        import orbax.checkpoint as ocp

        from tapclip_tpu.trainer import _restore_opt_state

        snap = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.resume))
        if lora is not None:
            lora = jax.tree.map(jnp.asarray, snap["params"])  # the LoRA tree
        else:
            params = jax.tree.map(jnp.asarray, snap["params"])
        opt_state = _restore_opt_state(opt_state, snap["opt_state"])
        start_epoch, resume_gstep = _resume_tail(snap, "host restore")
    if mesh is not None:
        fsdp = args.fsdp and lora is None
        params = shard_params(params, mesh, fsdp=fsdp)
        # Opt state mirrors the param layout leaf-for-leaf (TP/PP always;
        # + the data axis under fsdp = ZeRO moment sharding).
        opt_state = shard_opt_state(opt_state, mesh, fsdp=fsdp)
        if lora is not None:
            lora = replicate(lora, mesh)  # KB-scale adapters: replicated
        if teacher_params is not None:
            teacher_params = shard_params(teacher_params, mesh)
        if fsdp:
            log.info("FSDP/ZeRO: params + moments sharded 1/dp over "
                     "'data' (dp=%d)", mesh.shape["data"])

    if args.resume and args.sharded_snapshot:
        # Deferred past mesh placement on purpose: the snapshot restores
        # STRAIGHT into the live sharded layout — each device reads only its
        # own shards, resharded by Orbax if the saving topology differed.
        from tapclip_tpu.utils.checkpoint import (
            abstract_target,
            restore_sharded_snapshot,
            snapshot_format,
            snapshot_saved_target,
        )

        target = {
            "params": abstract_target(params if lora is None else lora),
            "opt_state": abstract_target(opt_state),
            "epoch": 0,
            "gstep": 0,
        }
        try:
            snap = restore_sharded_snapshot(os.path.abspath(args.resume),
                                            target)
        except Exception as err:
            # Orbax structure errors are opaque; classify before failing.
            fmt = snapshot_format(args.resume)
            if fmt == "host":
                raise SystemExit(
                    f"--resume {args.resume}: host-format snapshot (saved "
                    "WITHOUT --sharded-snapshot) whose structure does not "
                    "match this run — resume it without --sharded-snapshot. "
                    "(The host path merges optimizer state leaf-by-leaf "
                    "when the leaf counts match and fails loudly otherwise.)"
                ) from err
            if fmt is None:
                raise SystemExit(
                    f"--resume {args.resume}: not a readable Orbax snapshot "
                    "directory"
                ) from err
            # Sharded layout but the tree drifted (typically an optimizer/
            # schedule tweak changed opt_state since the save).  Restore
            # params/counters strictly and opt_state against the snapshot's
            # OWN structure, then merge by leaf order like the host path's
            # _restore_opt_state; on a leaf-count mismatch keep the fresh
            # optimizer state (params still resume) with a loud warning.
            repl = (jax.sharding.NamedSharding(mesh,
                                               jax.sharding.PartitionSpec())
                    if mesh is not None else None)
            saved = snapshot_saved_target(args.resume, sharding=repl)
            if not {"params", "opt_state"} <= set(saved):
                raise SystemExit(
                    f"--resume {args.resume}: sharded snapshot missing "
                    f"params/opt_state (has {sorted(saved)})"
                ) from err
            # Compatibility is decided from the snapshot METADATA (shapes
            # only, nothing materialized): when the saved opt-state leaves
            # match the live ones by order and shape, each leaf is restored
            # STRAIGHT into the live target's sharding — no replicated
            # intermediate (which would multiply opt-state memory by the
            # device count on exactly the FSDP runs this path serves).
            tmpl_leaves, treedef = jax.tree.flatten(opt_state)
            saved_leaves, saved_def = jax.tree.flatten(saved["opt_state"])
            compatible = len(saved_leaves) == len(tmpl_leaves) and all(
                tuple(getattr(s, "shape", ())) == tuple(getattr(t, "shape", ()))
                for s, t in zip(saved_leaves, tmpl_leaves)
            )
            part = dict(target)
            if compatible:
                part["opt_state"] = jax.tree.unflatten(saved_def, [
                    jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=t.sharding)
                    if hasattr(t, "sharding") and getattr(s, "shape", None)
                    is not None else s
                    for s, t in zip(saved_leaves, tmpl_leaves)
                ])
            else:
                # Incompatible: the restored moments will be discarded for
                # fresh state; restore against the saved structure (replicated
                # leaves) just to reach params/counters in one pass.
                part["opt_state"] = saved["opt_state"]
            try:
                snap = restore_sharded_snapshot(os.path.abspath(args.resume),
                                                part)
            except Exception as err2:
                raise SystemExit(
                    f"--resume {args.resume}: sharded snapshot does not "
                    "match this run beyond its optimizer state — the PARAMS "
                    "tree also drifted (model preset/LoRA change since the "
                    "save?).  Params cannot be merged; start fresh or "
                    "resume with the saving-time configuration."
                ) from err2
            if compatible:
                rest_leaves = jax.tree.leaves(snap["opt_state"])
                snap["opt_state"] = jax.tree.unflatten(treedef, [
                    r.astype(t.dtype)
                    if hasattr(t, "dtype") and hasattr(r, "astype")
                    and r.dtype != t.dtype else r
                    for r, t in zip(rest_leaves, tmpl_leaves)
                ])
                log.warning(
                    "sharded resume: optimizer-state STRUCTURE drifted since "
                    "the save (optimizer/schedule tweak?); merged %d "
                    "shape-compatible leaves BY ORDER into the current "
                    "layout — this assumes the transform-chain order is "
                    "unchanged since the save", len(rest_leaves))
            else:
                snap["opt_state"] = opt_state
                log.warning(
                    "sharded resume: snapshot optimizer state (%d leaves) is "
                    "not shape-compatible with the current optimizer (%d "
                    "leaves) — resuming params with FRESH optimizer state",
                    len(saved_leaves), len(tmpl_leaves))
        if lora is not None:
            lora = snap["params"]
        else:
            params = snap["params"]
        opt_state = snap["opt_state"]
        start_epoch, resume_gstep = _resume_tail(snap, "sharded restore")

    from tapclip_tpu.data.prefetch import background_iter

    import orbax.checkpoint as ocp

    ema_params = ema_update = None
    if args.ema_decay > 0 and lora is None:
        from tapclip_tpu.pretrain import make_ema_update

        # jnp.copy: a real copy (donation-safe) that keeps device placement
        ema_params = jax.tree.map(jnp.copy, params)
        ema_update = make_ema_update(args.ema_decay)
        log.info("EMA tracking enabled (decay %.4f)", args.ema_decay)

    validate = val_loader = None
    if args.val_shard_dir:
        from tapclip_tpu.data.shards import ShardLoader, list_shards
        from tapclip_tpu.pretrain import make_validation_fn

        val_loader = ShardLoader(
            list_shards(args.val_shard_dir),
            cfg.train.batch_size,
            tokenize=lambda caps: np.asarray(
                tokenizer.tokenize(caps, cfg.model.context_length)
            ),
            image_size=cfg.model.image_size,
            shuffle_buffer=1,
            seed=cfg.train.seed,
            output_dtype="uint8" if args.uint8_transfer else "float32",
        )
        validate = make_validation_fn(cfg.model)
        log.info("validation: %d held-out pairs (cap %d per epoch)",
                 val_loader.num_samples, args.val_samples)

    zs_index = zs_loader = None
    if args.zeroshot_val_root:
        from tapclip_tpu.data.imagefolder import ImageFolderIndex, Loader

        zs_index = ImageFolderIndex.scan(args.zeroshot_val_root)
        zs_loader = Loader(
            zs_index.samples, cfg.train.batch_size, shuffle=False,
            image_size=cfg.model.image_size,
            output_dtype="uint8" if args.uint8_transfer else "float32",
        )
        log.info("zero-shot validation: %d images, %d classes (every %d "
                 "epoch(s))", len(zs_index.samples), len(zs_index.classes),
                 max(1, args.zeroshot_frequency))
        # Hoisted jits: fresh jax.jit(lambda) wrappers key on function
        # identity, so building them per epoch would retrace/compile every
        # time (a remote-compile round trip each on the tunneled TPU).
        from tapclip_tpu.models import clip as _clip_model
        from tapclip_tpu.zero_shot import zero_shot_logits as _zs_logits

        zs_encode_fn = jax.jit(
            lambda pr, i: _clip_model.encode_text(pr, cfg.model, i)
        )
        zs_logits_fn = jax.jit(
            lambda pr, c, x: _zs_logits(pr, cfg.model, c, x)
        )

    def _run_validation(tree, tag=""):
        # fixed subset every epoch: pin the val stream back to epoch 0
        val_loader.restore({"epoch": 0, "shards_done": 0})
        vloss, r = validate(tree, iter(val_loader), args.val_samples)
        log.info(
            "[Epoch %d] val%s loss: %.4f | i2t R@1/5/10 %.3f/%.3f/%.3f | "
            "t2i R@1/5/10 %.3f/%.3f/%.3f",
            epoch, tag, vloss,
            r["i2t_r@1"], r["i2t_r@5"], r["i2t_r@10"],
            r["t2i_r@1"], r["t2i_r@5"], r["t2i_r@10"],
        )
        return {"loss": vloss, **r}

    snap_dir = os.path.join(paths["model_dir"], "pretrain_snapshot")
    history = []
    val_history = []
    # Per-step rng for the stochastic knobs (augment / patch dropout):
    # fold_in(base, step counter) — a fresh, seeded stream per run.
    step_rng_base = None
    # Resume continues the per-step rng sequence where the snapshot left it,
    # so a preempted-and-resumed run reproduces the un-preempted run's
    # crops/masks (matching the shard loader's epoch-aligned restore).
    gstep = resume_gstep
    if args.patch_dropout > 0 or args.augment:
        step_rng_base = jax.random.PRNGKey(cfg.train.seed + 7)
        if args.patch_dropout > 0:
            log.info("patch dropout: %.2f of vision patches per step",
                     args.patch_dropout)
        if args.augment:
            log.info("on-device augmentation: crop scale (%.2f, 1.0), "
                     "hflip %.2f", args.aug_scale_min, args.hflip)
    if args.accum_full_negatives > 1 and (
            lora is not None or teacher_params is not None):
        raise ValueError(
            "--accum-full-negatives is wired for the full-tree pretraining "
            "step only (not --lora-rank/--distill-teacher)"
        )
    accum_k = args.accum_full_negatives
    import contextlib

    from tapclip_tpu.utils.logging_utils import maybe_profile

    _profile = contextlib.ExitStack()
    _profile.enter_context(maybe_profile(args.profile_dir))
    try:
        for epoch in range(start_epoch, cfg.train.epochs + 1):
            losses = []
            macro_buf = []  # --accum-full-negatives: partial macros drop at epoch end
            # Decode runs on a producer thread; the loss stays a device scalar
            # inside the loop (a float() per step would cost a host RTT each).
            for item in background_iter(loader):
                if caption_ids is None:  # shard streaming: (images, token_ids)
                    images, ids = item
                else:  # ImageFolder: captions from the class-name template
                    images, labels, mask = item
                    ids = np.stack([caption_ids[int(l)] for l in labels])
                if accum_k > 1:
                    # Assemble the macro batch HOST-side (np): eager device
                    # concatenates would cost a ~100 ms dispatch each on the
                    # tunnel, per update.
                    macro_buf.append((np.asarray(images), np.asarray(ids)))
                    if len(macro_buf) < accum_k:
                        continue
                    images = np.concatenate([b[0] for b in macro_buf])
                    ids = np.concatenate([b[1] for b in macro_buf])
                    macro_buf = []
                batch = (jnp.asarray(images), jnp.asarray(ids))
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                if lora is not None:
                    lora, opt_state, m = step(params, lora, opt_state, *batch)
                elif teacher_params is not None:
                    params, opt_state, m = step(
                        params, teacher_params, opt_state, *batch
                    )
                    if ema_update is not None:
                        ema_params = ema_update(ema_params, params)
                else:
                    if step_rng_base is not None:
                        params, opt_state, m = step(
                            params, opt_state, *batch,
                            jax.random.fold_in(step_rng_base, gstep),
                        )
                        gstep += 1
                    else:
                        params, opt_state, m = step(params, opt_state, *batch)
                    if ema_update is not None:
                        ema_params = ema_update(ema_params, params)
                losses.append(m["loss"])
            # One batched readback for the whole epoch (a float() per element
            # would cost one ~125 ms host RTT per training step on the tunnel).
            avg = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            history.append(avg)
            log.info("[Epoch %d] contrastive loss: %.4f", epoch, avg)
            row = {"epoch": epoch, "loss": round(avg, 6),
                   "skipped_images": getattr(loader, "skipped", 0)}
            if validate is not None:
                tree = params
                if lora is not None:  # evaluate the effective (merged) weights
                    from tapclip_tpu.peft import merge_lora

                    tree = merge_lora(params, lora, alpha=args.lora_alpha)
                entry = _run_validation(tree)
                if ema_params is not None:
                    entry["ema"] = _run_validation(ema_params, tag="[ema]")
                val_history.append(entry)
                row.update({
                    "val_loss": round(entry["loss"], 6),
                    **{k: round(v, 4) for k, v in entry.items()
                       if k.startswith(("i2t_", "t2i_"))},
                })
            if zs_loader is not None and (
                epoch % max(1, args.zeroshot_frequency) == 0
            ):
                from tapclip_tpu.zero_shot import (
                    build_zero_shot_classifier,
                    evaluate_zero_shot,
                )

                def _zs_acc(tree):
                    clf = build_zero_shot_classifier(
                        tree, cfg.model, zs_index.classes, tokenizer,
                        encode_fn=zs_encode_fn,
                    )
                    return evaluate_zero_shot(
                        tree, cfg.model, clf, iter(zs_loader),
                        logits_fn=zs_logits_fn,
                    )

                tree = params
                if lora is not None:
                    from tapclip_tpu.peft import merge_lora

                    tree = merge_lora(params, lora, alpha=args.lora_alpha)
                acc = _zs_acc(tree)
                row["zeroshot_acc"] = round(acc, 4)
                msg = f"[Epoch {epoch}] zero-shot val accuracy: {acc:.2f}%"
                if ema_params is not None:
                    ema_acc = _zs_acc(ema_params)
                    row["zeroshot_acc_ema"] = round(ema_acc, 4)
                    msg += f" | ema {ema_acc:.2f}%"
                log.info(msg)
            _append_metrics_row(
                os.path.join(paths["csv_dir"], "pretrain_metrics.csv"), row
            )
            if args.save_every and epoch % args.save_every == 0:
                # Epoch-suffixed dir; the previous snapshot is deleted only AFTER
                # the new save finalizes, so a preemption mid-save (the event this
                # feature defends against) always leaves one valid resume point.
                new_snap = os.path.abspath(f"{snap_dir}_e{epoch:06d}")
                if args.sharded_snapshot:
                    # Live jax.Arrays, sharded layout preserved — no host
                    # gather of the FSDP/TP-sharded params + moments.
                    from tapclip_tpu.utils.checkpoint import (
                        save_sharded_snapshot,
                    )

                    save_sharded_snapshot(
                        new_snap,
                        {
                            "params": params if lora is None else lora,
                            "opt_state": opt_state,
                            "epoch": epoch,
                            "gstep": gstep,
                        },
                    )
                else:
                    ocp.PyTreeCheckpointer().save(
                        new_snap,
                        {
                            # LoRA runs snapshot the (tiny) adapter tree; the
                            # frozen base is reproducible from
                            # --pretrained/--preset.
                            "params": jax.tree.map(
                                np.asarray, params if lora is None else lora
                            ),
                            "opt_state": jax.tree.map(np.asarray, opt_state),
                            "epoch": epoch,
                            "gstep": gstep,
                        },
                        force=True,
                    )
                import shutil

                base = os.path.basename(snap_dir)
                for d in sorted(os.listdir(paths["model_dir"])):
                    # abspath BOTH sides: with a relative --output-root the
                    # unnormalized join would never equal new_snap and the
                    # sweep would delete the snapshot it just wrote.
                    full = os.path.abspath(os.path.join(paths["model_dir"], d))
                    if d.startswith(base) and full != new_snap and os.path.isdir(full):
                        shutil.rmtree(full, ignore_errors=True)
                log.info("pretrain snapshot at epoch %d -> %s", epoch, new_snap)
    finally:
        _profile.close()
    ckpt = os.path.join(paths["model_dir"], "clip_pretrained")
    import orbax.checkpoint as ocp

    if lora is not None:
        # Save the MERGED tree: drop-in for --pretrained in every driver.
        from tapclip_tpu.peft import merge_lora

        params = merge_lora(params, lora, alpha=args.lora_alpha)
    if teacher_params is not None:
        # Export a plain CLIP tree: the kd_proj head is training-only.
        from tapclip_tpu.distill import strip_distill_params

        params = strip_distill_params(params)
        if ema_params is not None:
            ema_params = strip_distill_params(ema_params)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(ckpt), jax.tree.map(np.asarray, params), force=True
    )
    log.info("full CLIP params saved: %s", ckpt)
    ema_ckpt = None
    if ema_params is not None:
        ema_ckpt = os.path.join(paths["model_dir"], "clip_pretrained_ema")
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(ema_ckpt),
            jax.tree.map(np.asarray, ema_params),
            force=True,
        )
        log.info("EMA params saved: %s", ema_ckpt)
    return {"loss_history": history, "val_history": val_history,
            "ckpt": ckpt, "ema_ckpt": ema_ckpt, "paths": paths}


if __name__ == "__main__":
    main()
