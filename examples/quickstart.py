"""End-to-end tour of tapclip_tpu on synthetic data (no weights needed).

Walks the full lifecycle a production user strings together: few-shot
prompt tuning -> evaluation -> adding an unseen class -> checkpointing ->
bulk featurization -> similarity search -> linear probe -> attribution +
saliency explainability. Runs on CPU in ~2 minutes with the tiny preset;
swap ``--preset tiny`` thinking for ``MODEL_PRESETS["ViT-B-16"]`` + real
weights (docs/REPRODUCE.md) for the real thing.

Run: python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU by default (probing the default backend would block if a TPU tunnel
# is configured but unreachable); QUICKSTART_BACKEND=tpu opts in.
if os.environ.get("QUICKSTART_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from tapclip_tpu import FullModel, get_dataloaders
    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.data.preprocess import make_preprocess
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.utils.eval_metrics import evaluate_accuracy

    tmp = tempfile.mkdtemp(prefix="tapclip_quickstart_")
    cfg = TINY_TEST
    classes = ["Backpack", "Pen", "Monitor"]

    # -- data: a color-separable synthetic ImageFolder --------------------
    from PIL import Image

    rng = np.random.default_rng(0)
    colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200)]
    for name, c in zip(classes, colors):
        d = os.path.join(tmp, "data", name)
        os.makedirs(d)
        for i in range(10):
            arr = np.clip(np.array(c)[None, None] +
                          rng.normal(0, 25, (cfg.image_size,) * 2 + (3,)),
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))
    train_loader, val_loader = get_dataloaders(
        os.path.join(tmp, "data"), classes, num_shots=5, batch_size=8,
        preprocess=make_preprocess(cfg.image_size), seed=0, verbose=False,
    )

    # -- model: random tiny CLIP + attribution-guided prompts -------------
    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    model = FullModel(classes, params, cfg)
    acc0 = evaluate_accuracy(model, val_loader, verbose=False)
    print(f"[1] zero-init accuracy: {acc0:.2f}%")

    # -- few-shot prompt tuning (the reference train.py loop) -------------
    from tapclip_tpu.config import TrainConfig
    from tapclip_tpu.trainer import fit_prompt_model

    fit = fit_prompt_model(
        model, train_loader, val_loader,
        TrainConfig(epochs=15, lr=5e-2, batch_size=8), verbose=False,
    )
    acc1 = evaluate_accuracy(model, val_loader, verbose=False)
    print(f"[2] after {len(fit.loss_history)} epochs of prompt tuning: "
          f"{acc1:.2f}% (loss {fit.loss_history[-1]:.3f})")

    # -- live class add (never retraces) ----------------------------------
    model.add_class_prompt("Clipboards")
    print(f"[3] added unseen class: {model.class_names}")

    # -- checkpoint round trip --------------------------------------------
    from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint

    ckpt = os.path.join(tmp, "prompt_ckpt")
    save_prompt_checkpoint(ckpt, trainable=model.trainable,
                           bank=model.prompt_learner.bank,
                           class_names=model.class_names)
    print(f"[4] checkpoint saved: {ckpt}")

    # -- bulk featurization + similarity search ---------------------------
    from tapclip_tpu.featurize import main as featurize_main
    from tapclip_tpu.search import main as search_main

    feats_dir = os.path.join(tmp, "feats")
    featurize_main(["--image-root", os.path.join(tmp, "data"),
                    "--out", feats_dir, "--preset", "tiny",
                    "--batch-size", "8"])
    results = search_main(["--index", feats_dir, "--row", "0", "-k", "3"])
    print(f"[5] search top hit for row 0: {results[0]['meta']}")

    # -- linear probe ------------------------------------------------------
    from tapclip_tpu.linear_probe import main as probe_main

    probe = probe_main(["--train-root", os.path.join(tmp, "data"),
                        "--preset", "tiny", "--batch-size", "8",
                        "--steps", "200"])
    print(f"[6] linear-probe train accuracy: {probe['train_acc']:.2%}")

    # -- explainability: attribution + patch saliency ----------------------
    from tapclip_tpu.utils.saliency import patch_saliency

    images, _, _ = next(iter(val_loader))
    out = model(images[:2])
    attr = np.asarray(out["attribution"])
    grid = patch_saliency(model.clip_params, cfg, images[:2])
    print(f"[7] attribution {attr.shape} rows sum "
          f"{np.asarray(attr).sum(-1)[:2].round(3)}; saliency grid "
          f"{grid.shape}")

    # -- batch predict over an unlabeled folder (tuned prompts) ------------
    from tapclip_tpu.predict import main as predict_main

    preds = predict_main(["--image-root", os.path.join(tmp, "data"),
                          "--out", os.path.join(tmp, "preds"),
                          "--preset", "tiny", "--classes", *model.class_names,
                          "--ckpt", ckpt, "--batch-size", "8", "--top-k", "2"])
    print(f"[8] batch predict: {preds['n']} rows -> {preds['csv']}")

    # -- AOT deployment artifact (StableHLO; loads with jax alone) ---------
    from tapclip_tpu.utils.model_export import export_model, load_exported

    exp_dir = export_model(os.path.join(tmp, "export"), model.clip_params,
                           cfg, model.prompt_cfg, model.trainable,
                           model.prompt_learner.bank, batch=2,
                           functions=("encode_image",))
    fns = load_exported(exp_dir)
    emb = fns["encode_image"](model.clip_params, images[:2])
    print(f"[9] exported encode_image rehydrated: {np.asarray(emb).shape} "
          "unit-norm features")

    print("quickstart complete.")
    return {"acc0": acc0, "acc1": acc1, "probe": probe["train_acc"],
            "n_preds": preds["n"]}


if __name__ == "__main__":
    main()
