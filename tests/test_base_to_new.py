"""Base-to-new generalization driver (tapclip_tpu/base_to_new.py)."""

import numpy as np
import pytest

from tapclip_tpu.base_to_new import harmonic_mean
from tapclip_tpu.config import TINY_TEST


def test_harmonic_mean():
    assert harmonic_mean(80.0, 80.0) == pytest.approx(80.0)
    assert harmonic_mean(100.0, 50.0) == pytest.approx(200.0 / 3.0)
    assert harmonic_mean(0.0, 0.0) == 0.0
    assert harmonic_mean(90.0, 0.0) == 0.0


def test_split_selection_test_disjoint_stratified():
    """Base is reported on a held-out half DISJOINT from the early-stopping
    selection half (round-4 review: re-scoring the selected state on the
    selection split deterministically returns fit.best_acc), and every
    multi-sample class appears in both halves."""
    from tapclip_tpu.base_to_new import split_selection_test

    val = [(f"c{label}_{i}.jpg", label)
           for label in range(3) for i in range(5)]
    sel, test = split_selection_test(val, seed=7)
    assert not set(sel) & set(test)
    assert set(sel) | set(test) == set(val)
    for label in range(3):
        assert any(lb == label for _, lb in sel)
        assert any(lb == label for _, lb in test)
    # deterministic under the same seed, different under another
    sel2, test2 = split_selection_test(val, seed=7)
    assert sel == sel2 and test == test2
    sel3, _ = split_selection_test(val, seed=8)
    assert sel != sel3

    # single-sample class: present in both halves rather than missing
    sel, test = split_selection_test([("only.jpg", 0)], seed=0)
    assert sel == test == [("only.jpg", 0)]


def test_train_keys_derived_from_transfer_keys():
    """The trained set must stay in lockstep with TRANSFER_KEYS (round-4
    review: a hand-duplicated list lets a new class-agnostic leaf transfer
    untrained)."""
    import inspect

    from tapclip_tpu import base_to_new

    src = inspect.getsource(base_to_new.run_base_to_new)
    assert "TRANSFER_KEYS if k in model.trainable" in src


@pytest.fixture(scope="module")
def four_class_folder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("b2n_data") / "train"
    rng = np.random.default_rng(0)
    colors = {
        "Blue": (30, 30, 200), "Cyan": (30, 200, 200),
        "Red": (200, 30, 30), "Yellow": (200, 200, 30),
    }
    for name, c in colors.items():
        d = root / name
        d.mkdir(parents=True)
        for i in range(8):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 15, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


def test_cli_end_to_end(four_class_folder, tmp_path):
    """Alphabetical halving -> Blue/Cyan base, Red/Yellow new; trained
    adjustor transfers, contexts don't; H bookkeeping + artifact."""
    from tapclip_tpu.base_to_new import main

    out = main([
        "--root", four_class_folder, "--preset", "tiny",
        "--shots", "4", "--epochs", "3", "--batch-size", "8",
        "--out", str(tmp_path / "b2n"),
    ])
    for k in ("Base", "New", "H"):
        assert 0.0 <= out[k] <= 100.0
    assert out["H"] == pytest.approx(
        harmonic_mean(out["Base"], out["New"]), abs=0.02
    )
    csv = (tmp_path / "b2n" / "base_to_new.csv").read_text().splitlines()
    assert csv[0] == "Base,New,H,Shots,KgLambda"
    assert len(csv) == 2


def test_kg_lambda_plumbs_through(four_class_folder):
    """--kg-lambda reaches the trainer (smoke: runs and reports)."""
    from tapclip_tpu.base_to_new import main

    out = main([
        "--root", four_class_folder, "--preset", "tiny",
        "--shots", "2", "--epochs", "1", "--batch-size", "8",
        "--kg-lambda", "0.5",
    ])
    assert out["KgLambda"] == 0.5
    assert np.isfinite(out["H"])


def test_training_moves_transfer_keys(four_class_folder):
    """The protocol must actually train the class-agnostic leaves it
    transfers: with ctx-only training (the old behavior) the adjustor and
    logit scale never move, New is training-invariant, and the driver
    cannot measure generalization (round-3 advisor finding)."""
    import jax

    from tapclip_tpu.base_to_new import TRANSFER_KEYS, run_base_to_new
    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.data.imagefolder import ImageFolderIndex, few_shot_split, Loader
    from tapclip_tpu.models.clip import init_clip_params
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.trainer import fit_prompt_model

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    index = ImageFolderIndex.scan(four_class_folder)
    base = list(index.classes)[:2]
    split = few_shot_split(index, base, 4, seed=0)
    pcfg = PromptConfig(max_classes=8)
    model = FullModel(base, params, TINY_TEST, prompt_cfg=pcfg,
                      rng=jax.random.PRNGKey(0))
    init_leaves = {k: jax.tree.map(np.asarray, model.trainable[k])
                   for k in TRANSFER_KEYS if k in model.trainable}
    mk = dict(image_size=TINY_TEST.image_size)
    fit = fit_prompt_model(
        model,
        Loader(split.train, 8, shuffle=True, seed=0, **mk),
        Loader(split.val, 8, shuffle=False, **mk),
        __import__("tapclip_tpu.config", fromlist=["TrainConfig"]).TrainConfig(
            lr=5e-2, epochs=3, batch_size=8, seed=0),
        verbose=False,
        trainable_keys=("ctx", "adjustor", "logit_scale"),
    )
    moved = False
    for k, before in init_leaves.items():
        after = jax.tree.map(np.asarray, fit.best_trainable[k])
        pairs = zip(jax.tree.leaves(before), jax.tree.leaves(after))
        if any(not np.array_equal(b, a) for b, a in pairs):
            moved = True
    assert moved, "adjustor/logit_scale did not train — New would be inert"


def test_fit_rejects_unknown_trainable_key(four_class_folder):
    import jax
    import pytest as _pytest

    from tapclip_tpu.models.clip import init_clip_params
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.trainer import fit_prompt_model

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    model = FullModel(["Blue", "Red"], params, TINY_TEST)
    with _pytest.raises(ValueError, match="trainable_keys"):
        fit_prompt_model(model, None, None,
                         __import__("tapclip_tpu.config",
                                    fromlist=["TrainConfig"]).TrainConfig(),
                         trainable_keys=("ctx", "frobnicate"))


def test_class_split_seed_changes_halves(four_class_folder):
    """A seeded shuffle must be able to produce a different base set than
    the alphabetical split (checked via the split log, cheaply: just run
    the split logic)."""
    from tapclip_tpu.data.imagefolder import ImageFolderIndex

    index = ImageFolderIndex.scan(four_class_folder)
    classes = list(index.classes)
    alpha_base = classes[: (len(classes) + 1) // 2]
    seen = set()
    for s in range(8):
        rs = np.random.default_rng(s)
        shuffled = [classes[i] for i in rs.permutation(len(classes))]
        seen.add(tuple(sorted(shuffled[: (len(classes) + 1) // 2])))
    assert any(b != tuple(sorted(alpha_base)) for b in seen)
