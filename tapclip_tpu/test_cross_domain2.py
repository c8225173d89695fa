"""Cross-domain eval with per-domain few-shot fine-tuning — rebuild of
``/root/reference/test_cross_domain2.py``.

For each ``(num_shots, domain)`` cell: restore the model to the checkpointed
state (the reference re-instantiates a fresh FullModel to avoid state
leakage, ``test_cross_domain2.py:71-81``; here a functional state reset is
exact and free), fine-tune the context bank only on the few-shot split (10
passes, AdamW lr=5e-3, ``:17-29,96-97``), then evaluate.  CSV + grouped bar
chart into the timestamped results tree (``:102-130``).
"""

from __future__ import annotations

import copy
import os
from typing import List, Optional

from tapclip_tpu.config import preset
from tapclip_tpu.test_cross_domain import (
    DEFAULT_DOMAINS,
    DEFAULT_SHOTS,
    add_cross_domain_args,
    evaluate_grid,
    load_prompt_checkpoint_into,
)
from tapclip_tpu.train import apply_overrides, build_argparser, build_model, setup_platform


def main(argv: Optional[List[str]] = None) -> dict:
    p = add_cross_domain_args(build_argparser(__doc__))
    p.add_argument("--ft-steps", type=int, default=10)  # test_cross_domain2.py:57
    p.add_argument("--ft-lr", type=float, default=5e-3)  # test_cross_domain2.py:58
    args = p.parse_args(argv)
    setup_platform(args.platform)
    cfg = apply_overrides(preset(args.preset), args)

    from tapclip_tpu.trainer import fine_tune_on_few_shot
    from tapclip_tpu.utils.logging_utils import generate_output_paths, setup_logging
    from tapclip_tpu.utils.plotting import save_cross_domain_bar, save_results_csv

    paths = generate_output_paths(cfg.version + "_xdomain_ft", cfg.output_root)
    log = setup_logging(os.path.join(paths["log_dir"], "cross_domain_ft.log"))

    class_names = list(args.seen_classes or cfg.class_names)
    model, preprocess = build_model(cfg, bpe_path=args.bpe_path)
    if args.checkpoint:
        load_prompt_checkpoint_into(model, args.checkpoint, class_names)
        log.info("loaded checkpoint %s", args.checkpoint)
    for cls in class_names:  # test_cross_domain2.py:83-85
        model.add_class_prompt(cls)

    # Snapshot the restored state; restore_fn resets to it before each cell —
    # the functional equivalent of re-instantiating the model (:71-81).
    snapshot = {
        "trainable": copy.copy(model.trainable),
        "bank": model.prompt_learner.bank,
        "class_names": list(model.class_names),
    }

    def restore_fn(m):
        m.trainable = dict(snapshot["trainable"])
        m.prompt_learner.bank = snapshot["bank"]

    def fine_tune_fn(m, loader):
        fine_tune_on_few_shot(m, loader, steps=args.ft_steps, lr=args.ft_lr)

    domains = args.domains or DEFAULT_DOMAINS
    shots_list = args.shots if args.shots is not None else DEFAULT_SHOTS
    domain_root = args.domain_root or os.path.dirname(cfg.data_root) or "."

    results = evaluate_grid(
        model, preprocess, domain_root, domains, shots_list, class_names,
        batch_size=cfg.train.batch_size, seed=cfg.train.seed,
        fine_tune_fn=fine_tune_fn, restore_fn=restore_fn,
    )

    csv_path = save_results_csv(
        results, os.path.join(paths["csv_dir"], "cross_domain_results.csv")
    )
    plot_path = save_cross_domain_bar(
        results,
        os.path.join(paths["plot_dir"], f"cross_domain_bar_{cfg.version}.png"),
        title=f"Cross-Domain Accuracy [{cfg.version}]",
        ylim=(0, 100),
    )
    log.info("✅ Results saved to %s", csv_path)
    log.info("✅ Plot saved to %s", plot_path)
    return {"results": results, "csv": csv_path, "plot": plot_path}


if __name__ == "__main__":
    main()
