"""Unified few-shot adaptation benchmark: every method, one command.

The framework ships eight adaptation paths over the same frozen CLIP
towers — zero-shot, weighted k-NN, linear probe, Tip-Adapter (+F),
CLIP-Adapter, TAP prompt tuning (the reference's method), MaPLe, and TPT
(test-time tuning, which uses no training shots at all).  This driver runs
any subset on ONE dataset/shots split and emits a comparison table:

    Method,Shots,Accuracy,TrainSeconds   (fewshot.csv + grouped bar PNG)

Frozen-tower methods share a single feature-extraction pass (the dominant
cost); only prompt tuning trains over those cached features, and only
MaPLe re-runs the image tower per step (its vision prompts are trainable).
Split semantics are ``few_shot_split``'s throughout — the same split every
method sees is the same split the reference's transfer drivers use
(``/root/reference/dataset.py:34-57``).

Hyperparameter note: tip-adapter's alpha/beta grid search and
clip-adapter's optional ratio search select on the EVAL features —
matching the upstream papers' practice of tuning on the test split.
Pass ``--no-search`` for fixed defaults when that leakage matters.

Usage:
    python -m tapclip_tpu.fewshot --train-root .../Real_World --shots 16 \\
        --model ViT-B-16 --pretrained ckpt/ --out results/fewshot
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np

log = logging.getLogger("tapclip_tpu")

ALL_METHODS = (
    "zero-shot",
    "knn",
    "linear-probe",
    "tip-adapter",
    "tip-adapter-f",
    "clip-adapter",
    "prompt",
    "prograd",
    "promptsrc",
    "maple",
    "tpt",
)


def knn_classify(
    train_feats,
    train_labels,
    query_feats,
    num_classes: int,
    *,
    k: int = 20,
    temperature: float = 0.07,
):
    """Weighted k-NN over L2-normalized features -> ``[B, C]`` scores.

    The DINO/self-supervised eval protocol (Caron et al. 2021, after Wu
    et al. 2018): each query's k nearest train features vote with weight
    ``exp(cos_sim / T)``.  One GEMM + ``top_k`` on device — the TPU shape
    of a k-NN (no trees; exact search is a [B, N] matmul at CLIP scales,
    same argument as ``search.SearchIndex``).
    """
    import jax
    import jax.numpy as jnp

    X = jnp.asarray(train_feats, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    Q = jnp.asarray(query_feats, jnp.float32)
    k = min(k, X.shape[0])

    @jax.jit
    def scores(Q):
        sims = Q @ X.T  # [B, N] cosine (inputs are unit-norm)
        topv, topi = jax.lax.top_k(sims, k)
        w = jnp.exp(topv / temperature)  # [B, k]
        votes = jax.nn.one_hot(y[topi], num_classes)  # [B, k, C]
        return jnp.einsum("bk,bkc->bc", w, votes)

    return scores(Q)


def run_fewshot_benchmark(
    train_root: str,
    *,
    val_root: Optional[str] = None,
    shots: int = 16,
    methods=ALL_METHODS,
    cfg=None,
    params=None,
    bpe_path: Optional[str] = None,
    batch_size: int = 256,
    epochs: int = 30,
    lr: float = 2e-3,
    maple_depth: int = 3,
    maple_prompt_len: int = 2,
    tpt_views: int = 8,
    search_hp: bool = True,
    ensemble: bool = False,
    seed: int = 0,
    verbose: bool = True,
) -> List[Dict]:
    """Run the selected methods -> ``[{Method, Shots, Accuracy, TrainSeconds}]``.

    Accuracy is percent on the held-out split (``few_shot_split``'s val or
    ``val_root``).  ``params``/``cfg`` as in the other drivers.
    """
    import jax

    from tapclip_tpu.config import PromptConfig, TrainConfig
    from tapclip_tpu.data.imagefolder import (
        ImageFolderIndex,
        Loader,
        few_shot_split,
    )
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.tip_adapter import _extract_split
    from tapclip_tpu.zero_shot import (
        DEFAULT_TEMPLATES,
        OPENAI_IMAGENET_TEMPLATES_SMALL,
        build_zero_shot_classifier,
    )

    unknown = [m for m in methods if m not in ALL_METHODS]
    if unknown:
        raise ValueError(f"unknown methods {unknown}; choose from {ALL_METHODS}")

    tokenizer = get_tokenizer(bpe_path)
    index = ImageFolderIndex.scan(train_root)
    class_names = index.classes
    n_cls = len(class_names)
    split = few_shot_split(index, class_names, shots, seed=seed)
    if val_root:
        val_index = ImageFolderIndex.scan(val_root)
        val_samples = [
            (path, index.class_to_idx[val_index.classes[raw]])
            for path, raw in val_index.samples
            if val_index.classes[raw] in index.class_to_idx
        ]
    else:
        val_samples = split.val

    logit_scale = float(np.exp(np.asarray(params["logit_scale"], np.float32)))
    zs_classifier = np.asarray(
        build_zero_shot_classifier(
            params, cfg, class_names, tokenizer,
            templates=(OPENAI_IMAGENET_TEMPLATES_SMALL if ensemble
                       else DEFAULT_TEMPLATES),
        )
    )

    # One shared frozen-tower pass serves every feature-space method.
    needs_feats = [m for m in methods if m not in ("maple", "tpt")]
    Xtr = ytr = Xva = yva = None
    if needs_feats:
        Xtr, ytr = _extract_split(cfg, params, split.train, batch_size)
        Xva, yva = _extract_split(cfg, params, val_samples, batch_size)
        if verbose:
            log.info("fewshot: %d train / %d eval features, %d classes",
                     len(ytr), len(yva), n_cls)

    shots_label = f"{shots}-shot"
    results: List[Dict] = []

    def record(method: str, acc_pct: float, dt: float) -> None:
        results.append({
            "Method": method,
            "Shots": shots_label,
            "Accuracy": round(float(acc_pct), 2),
            "TrainSeconds": round(float(dt), 2),
        })
        if verbose:
            log.info("fewshot %-14s %6.2f%%  (%.1fs)", method, acc_pct, dt)

    if "zero-shot" in methods:
        t0 = time.monotonic()
        pred = (Xva @ zs_classifier.T).argmax(-1)
        record("zero-shot", 100.0 * (pred == yva).mean(), time.monotonic() - t0)

    if "knn" in methods:
        t0 = time.monotonic()
        pred = np.asarray(knn_classify(Xtr, ytr, Xva, n_cls)).argmax(-1)
        record("knn", 100.0 * (pred == yva).mean(), time.monotonic() - t0)

    if "linear-probe" in methods:
        from tapclip_tpu.linear_probe import fit_linear_probe, probe_accuracy

        t0 = time.monotonic()
        W, b = fit_linear_probe(Xtr, ytr, n_cls, seed=seed)
        record("linear-probe", 100.0 * probe_accuracy(Xva, yva, W, b),
               time.monotonic() - t0)

    if "tip-adapter" in methods or "tip-adapter-f" in methods:
        from tapclip_tpu.tip_adapter import (
            build_cache_model,
            cache_accuracy,
            fit_tip_adapter_f,
            search_hyperparams,
        )

        t0 = time.monotonic()
        keys, values = build_cache_model(Xtr, ytr, n_cls)
        alpha, beta = 1.0, 5.5
        if search_hp:
            alpha, beta, _ = search_hyperparams(
                Xva, yva, keys, values, zs_classifier, logit_scale
            )
        build_dt = time.monotonic() - t0
        if "tip-adapter" in methods:
            record(
                "tip-adapter",
                100.0 * cache_accuracy(Xva, yva, keys, values, zs_classifier,
                                       logit_scale, alpha, beta),
                build_dt,
            )
        if "tip-adapter-f" in methods:
            t0 = time.monotonic()
            keys_f = fit_tip_adapter_f(
                keys, values, Xtr, ytr, zs_classifier, logit_scale, alpha, beta
            )
            record(
                "tip-adapter-f",
                100.0 * cache_accuracy(Xva, yva, keys_f, values, zs_classifier,
                                       logit_scale, alpha, beta),
                build_dt + (time.monotonic() - t0),
            )

    if "clip-adapter" in methods:
        from tapclip_tpu.clip_adapter import (
            adapter_accuracy,
            fit_clip_adapter,
            search_ratio,
        )

        t0 = time.monotonic()
        visual, text = fit_clip_adapter(
            Xtr, ytr, zs_classifier, logit_scale, seed=seed
        )
        ratio = 0.2
        if search_hp:
            ratio, _ = search_ratio(Xva, yva, zs_classifier, logit_scale, visual)
        record(
            "clip-adapter",
            100.0 * adapter_accuracy(Xva, yva, zs_classifier, logit_scale,
                                     visual, ratio),
            time.monotonic() - t0,
        )

    if "prompt" in methods:
        from tapclip_tpu.models.model_wrapper import FullModel
        from tapclip_tpu.trainer import CachedSet, fit_prompt_model

        t0 = time.monotonic()
        model = FullModel(
            class_names, params, cfg,
            prompt_cfg=PromptConfig(max_classes=max(8, n_cls)),
            tokenizer=tokenizer,
            rng=jax.random.PRNGKey(seed),
        )
        # Features are L2-normalized by _extract_split; full_model_forward
        # re-normalizes (idempotent), so the shared pass is reusable here.
        fit = fit_prompt_model(
            model,
            CachedSet(Xtr, ytr),
            CachedSet(Xva, yva),
            TrainConfig(lr=lr, epochs=epochs, batch_size=min(batch_size, 64),
                        seed=seed),
            verbose=False,
        )
        record("prompt", fit.best_acc, time.monotonic() - t0)

    if "prograd" in methods:
        # Prompt tuning under the ProGrad projection (Zhu et al. 2023):
        # same protocol as "prompt", the update constrained to never
        # increase the KL to the frozen zero-shot predictions.
        from tapclip_tpu.models.model_wrapper import FullModel
        from tapclip_tpu.trainer import CachedSet, fit_prompt_model

        t0 = time.monotonic()
        model = FullModel(
            class_names, params, cfg,
            prompt_cfg=PromptConfig(max_classes=max(8, n_cls)),
            tokenizer=tokenizer,
            rng=jax.random.PRNGKey(seed),
        )
        fit = fit_prompt_model(
            model,
            CachedSet(Xtr, ytr),
            CachedSet(Xva, yva),
            TrainConfig(lr=lr, epochs=epochs, batch_size=min(batch_size, 64),
                        seed=seed, prograd_lambda=1.0),
            verbose=False,
        )
        record("prograd", fit.best_acc, time.monotonic() - t0)

    if "promptsrc" in methods:
        # PromptSRC recipe (Khattak et al. 2023): feature + logit
        # self-regularization toward the frozen zero-shot model (with a
        # small multi-template ensembled anchor — the paper's textual
        # diversity), plus Gaussian aggregation of the per-epoch prompts.
        from tapclip_tpu.models.model_wrapper import FullModel
        from tapclip_tpu.promptsrc import fit_promptsrc
        from tapclip_tpu.trainer import CachedSet

        t0 = time.monotonic()
        model = FullModel(
            class_names, params, cfg,
            prompt_cfg=PromptConfig(max_classes=max(8, n_cls)),
            tokenizer=tokenizer,
            rng=jax.random.PRNGKey(seed),
        )
        res = fit_promptsrc(
            model,
            CachedSet(Xtr, ytr),
            CachedSet(Xva, yva),
            TrainConfig(lr=lr, epochs=epochs, batch_size=min(batch_size, 64),
                        seed=seed, kg_lambda=1.0, scl_lambda=1.0,
                        anchor_templates=("a photo of a {}",
                                          "a blurry photo of a {}",
                                          "a drawing of a {}")),
            verbose=False,
        )
        record("promptsrc", max(res.gpa_acc, res.fit.best_acc),
               time.monotonic() - t0)

    if "maple" in methods:
        from tapclip_tpu.maple import fit_maple
        from tapclip_tpu.models.model_wrapper import FullModel

        t0 = time.monotonic()
        model = FullModel(
            class_names, params, cfg,
            prompt_cfg=PromptConfig(
                maple_depth=maple_depth,
                prompt_len=maple_prompt_len,
                max_classes=max(8, n_cls),
            ),
            tokenizer=tokenizer,
            rng=jax.random.PRNGKey(seed),
        )
        mk = dict(image_size=cfg.image_size, output_dtype="uint8")
        res = fit_maple(
            model,
            Loader(split.train, min(batch_size, 32), shuffle=True, seed=seed, **mk),
            Loader(val_samples, min(batch_size, 64), shuffle=False, **mk),
            epochs=epochs, lr=lr, verbose=False,
        )
        record("maple", res["best_acc"], time.monotonic() - t0)

    if "tpt" in methods:
        # Test-time tuning: no training shots consumed — the table row is
        # the zero-shot-regime baseline the paper reports (template-init
        # context, per-sample entropy minimization on the eval images).
        from tapclip_tpu.models.model_wrapper import FullModel
        from tapclip_tpu.tpt import TPTConfig, evaluate_tpt

        t0 = time.monotonic()
        model = FullModel(
            class_names, params, cfg,
            prompt_cfg=PromptConfig(max_classes=max(8, n_cls)),
            tokenizer=tokenizer,
            rng=jax.random.PRNGKey(seed),
        )
        res = evaluate_tpt(
            model, val_samples,
            tpt=TPTConfig(n_views=tpt_views, steps=1),
            batch_size=min(batch_size, 16),
            seed=seed, verbose=False,
        )
        record("tpt", res["accuracy"], time.monotonic() - t0)

    return results


def save_artifacts(results: List[Dict], out_dir: str) -> Dict[str, str]:
    """``fewshot.csv`` + grouped bar chart under ``out_dir``."""
    import pandas as pd

    from tapclip_tpu.utils.plotting import save_cross_domain_bar

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "fewshot.csv")
    pd.DataFrame(
        results, columns=["Method", "Shots", "Accuracy", "TrainSeconds"]
    ).to_csv(csv_path, index=False)
    # The grouped-bar helper keys on Domain/Shots; methods are the groups.
    chart = save_cross_domain_bar(
        [dict(r, Domain=r["Method"]) for r in results],
        os.path.join(out_dir, "fewshot_bar.png"),
        title="Few-Shot Adaptation Methods",
    )
    return {"csv": csv_path, "chart": chart}


def main(argv: Optional[List[str]] = None) -> List[Dict]:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--train-root", required=True)
    p.add_argument("--val-root", default=None)
    p.add_argument("--shots", type=int, default=16)
    p.add_argument("--methods", nargs="+", default=list(ALL_METHODS),
                   choices=list(ALL_METHODS))
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--maple-depth", type=int, default=3)
    p.add_argument("--maple-prompt-len", type=int, default=2)
    p.add_argument("--tpt-views", type=int, default=8)
    p.add_argument("--no-search", action="store_true",
                   help="fixed tip/adapter hyperparameters (no eval-split search)")
    p.add_argument("--ensemble", action="store_true")
    p.add_argument("--out", default=None, help="artifact dir (csv + bar chart)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    from tapclip_tpu.config import MODEL_PRESETS, preset
    from tapclip_tpu.featurize import load_clip_params

    cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
    params = load_clip_params(cfg, args.pretrained)
    results = run_fewshot_benchmark(
        args.train_root,
        val_root=args.val_root,
        shots=args.shots,
        methods=tuple(args.methods),
        cfg=cfg,
        params=params,
        bpe_path=args.bpe_path,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        maple_depth=args.maple_depth,
        maple_prompt_len=args.maple_prompt_len,
        tpt_views=args.tpt_views,
        search_hp=not args.no_search,
        ensemble=args.ensemble,
        seed=args.seed,
    )
    if args.out:
        paths = save_artifacts(results, args.out)
        log.info("fewshot artifacts: %s", paths)
    return results


if __name__ == "__main__":
    main()
