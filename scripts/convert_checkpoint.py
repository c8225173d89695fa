"""Convert checkpoints between the reference torch formats and tapclip_tpu.

Usage:
  # open_clip CLIP weights (.bin/.pt) -> Orbax param tree
  python scripts/convert_checkpoint.py clip --src open_clip_pytorch_model.bin \\
      --model ViT-B-32 --dst converted/clip_vitb32

  # reference FullModel prompt checkpoint (.pt, legacy or per-class layout)
  # -> Orbax prompt checkpoint usable by the drivers
  python scripts/convert_checkpoint.py prompt --src best_model_epoch27_acc99.71.pt \\
      --classes Backpack Alarm_Clock Laptop Pen --model ViT-B-32 \\
      --dst converted/prompt_ckpt

  # Orbax param tree (pretrained/EMA/distilled here) -> open_clip .bin,
  # loadable back into the torch ecosystem
  python scripts/convert_checkpoint.py export --src pretrain_out/clip_pretrained \\
      --model ViT-B-16 --dst exported_model.bin
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("clip", help="open_clip weights -> Orbax")
    pc.add_argument("--src", required=True)
    pc.add_argument("--model", default="ViT-B-32")
    pc.add_argument("--dst", required=True)

    pe = sub.add_parser("export", help="Orbax param tree -> open_clip .bin")
    pe.add_argument("--src", required=True)
    pe.add_argument("--model", default="ViT-B-16")
    pe.add_argument("--dst", required=True)

    px = sub.add_parser("prompt-export",
                        help="Orbax prompt checkpoint -> reference .pt")
    px.add_argument("--src", required=True)
    px.add_argument("--dst", required=True)
    px.add_argument("--model", default="ViT-B-32", help=argparse.SUPPRESS)
    px.add_argument("--legacy", action="store_true",
                    help="write the stacked context_emb layout instead of "
                         "per-class context_bank entries")

    pp = sub.add_parser("prompt", help="reference prompt checkpoint -> Orbax")
    pp.add_argument("--src", required=True)
    pp.add_argument("--classes", nargs="+", required=True)
    pp.add_argument("--model", default="ViT-B-32")
    pp.add_argument("--prompt-len", type=int, default=5)
    pp.add_argument("--bpe-path", default=None)
    pp.add_argument("--dst", required=True)

    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tapclip_tpu.config import MODEL_PRESETS, PromptConfig

    cfg = MODEL_PRESETS[args.model]

    if args.cmd == "clip":
        import orbax.checkpoint as ocp

        from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

        params = load_openclip_checkpoint(args.src, cfg)
        ocp.PyTreeCheckpointer().save(os.path.abspath(args.dst), params, force=True)
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"converted {n:,} params -> {args.dst}")
        return

    if args.cmd == "prompt-export":
        from tapclip_tpu.utils.checkpoint import restore_prompt_checkpoint
        from tapclip_tpu.utils.torch_convert import (
            save_reference_prompt_checkpoint,
        )

        state = restore_prompt_checkpoint(os.path.abspath(args.src))
        names = state["meta"]["class_names"]
        save_reference_prompt_checkpoint(
            state["trainable"]["ctx"], names, args.dst, legacy=args.legacy,
        )
        print(f"exported prompt checkpoint ({len(names)} classes, "
              f"{'legacy' if args.legacy else 'per-class'} layout) -> {args.dst}")
        return

    if args.cmd == "export":
        import orbax.checkpoint as ocp

        from tapclip_tpu.utils.torch_convert import save_openclip_checkpoint

        params = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.src))
        save_openclip_checkpoint(params, cfg, args.dst)
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"exported {n:,} params -> {args.dst}")
        return

    # prompt checkpoint
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.test_cross_domain import load_prompt_checkpoint_into
    from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint

    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    model = FullModel(
        args.classes,
        params,
        cfg,
        prompt_cfg=PromptConfig(prompt_len=args.prompt_len,
                                max_classes=max(8, len(args.classes))),
        tokenizer=get_tokenizer(args.bpe_path, cfg.context_length),
    )
    load_prompt_checkpoint_into(model, args.src, args.classes)
    save_prompt_checkpoint(
        os.path.abspath(args.dst),
        trainable=model.trainable,
        bank=model.prompt_learner.bank,
        class_names=model.class_names,
        extra_meta={"source": os.path.abspath(args.src)},
    )
    print(f"converted prompt checkpoint ({len(args.classes)} classes) -> {args.dst}")


if __name__ == "__main__":
    main()
