"""Export AOT model artifacts (serialized StableHLO) for deployment.

The reference ships pickled state dicts and requires its model code at load
time (``/root/reference/train.py:131-133``); this exports the *computation*
via ``jax.export`` so a serving host runs the model with jax alone.

Usage (random weights, tiny preset, CPU):
    python scripts/export_model.py --preset tiny --platform cpu \\
        --out /tmp/tapclip_export --batch 8 \\
        --functions encode_image encode_text classify full_forward

Real deployment (TPU, converted open_clip weights, tuned prompts):
    python scripts/export_model.py --model ViT-B-16 \\
        --pretrained open_clip_pytorch_model.bin --ckpt results/.../ckpt \\
        --classes Backpack Pen Mug --batch 256 --out exports/vitb16_b256

With ``classify`` in the function set, the script also writes
``class_features.npz`` (adjusted text features + logit scale + class mask)
next to the artifacts — everything the classify program needs at call time
besides the tower weights and pixels.

``--poly`` exports a single batch-size-polymorphic artifact (forces
``attn_impl='xla'``; Pallas grids need static shapes).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("tapclip_tpu.export")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--preset", default=None,
                   help="experiment preset ('tiny' for tests); overrides "
                        "--model")
    p.add_argument("--model", default="ViT-B-16",
                   help="model preset when no --preset is given")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    p.add_argument("--pretrained", default=None,
                   help="open_clip .bin/.pt or converted Orbax dir")
    p.add_argument("--ckpt", default=None,
                   help="tuned prompt checkpoint (Orbax dir or reference .pt)")
    p.add_argument("--classes", nargs="+", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--functions", nargs="+",
                   default=["encode_image", "encode_text"],
                   choices=["encode_image", "encode_text", "classify",
                            "full_forward"])
    p.add_argument("--out", required=True)
    p.add_argument("--poly", action="store_true",
                   help="batch-polymorphic export (attn_impl=xla)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms baked into the artifact "
                        "(default: current backend)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from tapclip_tpu.train import setup_platform

    setup_platform(args.platform)

    import jax
    import numpy as np

    from tapclip_tpu.config import MODEL_PRESETS, ExperimentConfig, preset
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.train import build_model
    from tapclip_tpu.utils import model_export as ME

    import dataclasses

    if args.preset:
        cfg: ExperimentConfig = preset(args.preset)
    else:
        cfg = ExperimentConfig(model=MODEL_PRESETS[args.model])
    if args.classes:
        cfg = dataclasses.replace(cfg, class_names=tuple(args.classes))
    if args.pretrained:
        cfg = dataclasses.replace(cfg, pretrained_path=args.pretrained)
    if args.poly:
        cfg = dataclasses.replace(cfg, model=cfg.model.replace(attn_impl="xla"))

    model: FullModel
    model, _ = build_model(cfg)
    if args.ckpt:
        from tapclip_tpu.utils.checkpoint import apply_prompt_checkpoint

        apply_prompt_checkpoint(model, args.ckpt)
        log.info("loaded tuned prompts from %s", args.ckpt)

    out = ME.export_model(
        args.out,
        model.clip_params,
        cfg.model,
        model.prompt_cfg,
        model.trainable,
        model.prompt_learner.bank,
        batch=args.batch,
        functions=tuple(args.functions),
        platforms=args.platforms,
        symbolic_batch=args.poly,
    )
    for name, meta in ME.load_manifest(out)["functions"].items():
        log.info("  %-13s %8d bytes  platforms=%s", name, meta["bytes"],
                 ",".join(meta["platforms"]))

    if "classify" in args.functions:
        import jax.numpy as jnp

        from tapclip_tpu.models.model_wrapper import (
            text_features_with_attribution,
        )

        bank = model.prompt_learner.bank
        # params/bank as jit ARGUMENTS (closures bake weight literals into
        # the program — the tunneled-compile HTTP-413 trap; see CLAUDE.md)
        feats, _ = jax.jit(
            lambda p, ctx, bk, adj: text_features_with_attribution(
                p, ctx, bk, cfg.model, model.prompt_cfg, adj
            )
        )(model.clip_params, model.trainable["ctx"], bank,
          model.trainable["adjustor"])
        npz = os.path.join(out, "class_features.npz")
        np.savez(
            npz,
            text_feats=np.asarray(feats, np.float32),
            logit_scale=np.float32(np.asarray(model.trainable["logit_scale"])),
            class_mask=np.asarray(bank.class_mask),
            class_names=np.asarray(list(model.class_names)),
        )
        log.info("  class_features.npz: %d classes (capacity %d)",
                 model.n_cls, bank.capacity)
    log.info("export complete: %s", out)
    return out


if __name__ == "__main__":
    main()
