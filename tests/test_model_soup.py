"""Model soups: uniform averaging + greedy recipe."""

import os

import numpy as np
import pytest

import scripts.model_soup as MS


def test_average_trees_exact():
    trees = [
        {"a": np.full((2, 2), float(i)), "b": {"c": np.full((3,), 2.0 * i)}}
        for i in range(1, 4)
    ]
    soup = MS.average_trees(trees)
    np.testing.assert_allclose(soup["a"], 2.0)  # mean(1,2,3)
    np.testing.assert_allclose(soup["b"]["c"], 4.0)  # mean(2,4,6)


def test_average_trees_dtype_and_structure():
    import jax.numpy as jnp

    trees = [
        {"w": jnp.ones((2,), jnp.bfloat16) * i} for i in (1.0, 3.0)
    ]
    soup = MS.average_trees(trees)
    assert np.asarray(soup["w"]).dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(soup["w"], np.float32), 2.0)
    with pytest.raises(ValueError, match="structure"):
        MS.average_trees([{"w": np.ones(2)}, {"x": np.ones(2)}])
    with pytest.raises(ValueError, match="no ingredient"):
        MS.average_trees([])


def test_greedy_soup_keeps_helpful_drops_harmful():
    # eval = negative distance to target value 1.0 of the scalar "param"
    trees = [{"w": np.asarray([v])} for v in (1.0, 1.2, 9.0)]

    def eval_fn(tree):
        return -abs(float(tree["w"][0]) - 1.0)

    accs = [eval_fn(t) for t in trees]
    order = list(np.argsort(accs)[::-1])  # best first: 0, 1, 2
    soup, kept, best = MS.greedy_soup(trees, order, eval_fn)
    assert kept == [0]  # 1.2 pulls the mean to 1.1 (worse), 9.0 far worse
    np.testing.assert_allclose(soup["w"], 1.0)


def test_cli_uniform_and_greedy(tmp_path, tiny_cfg, tiny_params):
    import jax
    import orbax.checkpoint as ocp
    from PIL import Image

    from tapclip_tpu.models import clip as C

    # two ingredient checkpoints with different seeds
    paths = []
    for seed in (0, 1):
        params = C.init_clip_params(jax.random.PRNGKey(seed), tiny_cfg)
        d = os.path.abspath(tmp_path / f"ing{seed}")
        ocp.PyTreeCheckpointer().save(d, jax.tree.map(np.asarray, params))
        paths.append(d)

    out = MS.main([
        "--inputs", *paths, "--out", str(tmp_path / "soup"),
        "--preset", "tiny", "--platform", "cpu",
    ])
    restored = ocp.PyTreeCheckpointer().restore(out["out"])
    a = ocp.PyTreeCheckpointer().restore(paths[0])
    b = ocp.PyTreeCheckpointer().restore(paths[1])
    np.testing.assert_allclose(
        restored["logit_scale"],
        (np.float64(a["logit_scale"]) + np.float64(b["logit_scale"])) / 2,
        rtol=1e-6,
    )

    # greedy: needs a labeled val folder
    rng = np.random.default_rng(0)
    root = tmp_path / "val"
    for ci, name in enumerate(["A", "B"]):
        (root / name).mkdir(parents=True)
        base = np.zeros(3)
        base[ci] = 180
        for i in range(4):
            arr = np.clip(base + rng.normal(0, 25, (32, 32, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(root / name / f"{i}.jpg")
    out2 = MS.main([
        "--inputs", *paths, "--out", str(tmp_path / "gsoup"), "--greedy",
        "--val-root", str(root), "--preset", "tiny", "--platform", "cpu",
        "--batch-size", "4",
    ])
    assert 1 <= len(out2["kept"]) <= 2
    assert out2["val_acc"] is not None

    with pytest.raises(SystemExit, match="at least 2"):
        MS.main(["--inputs", paths[0], "--out", str(tmp_path / "x"),
                 "--preset", "tiny", "--platform", "cpu"])
