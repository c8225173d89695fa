"""Inspect any checkpoint this framework reads or writes.

Prints the tree structure, leaf shapes/dtypes, and parameter counts of an
Orbax directory (param tree, prompt checkpoint, or pretrain snapshot) or a
torch ``.pt``/``.bin`` state dict — the debugging companion to
``convert_checkpoint.py``.

Usage: python scripts/ckpt_info.py <path> [--depth N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _walk(tree, prefix="", depth_left=99):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}{k}.", depth_left - 1)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}{i}.", depth_left - 1)
    else:
        yield prefix.rstrip("."), tree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--depth", type=int, default=0,
                   help="aggregate leaves deeper than this (0 = full detail)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    if os.path.isdir(args.path):
        import orbax.checkpoint as ocp

        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.path))
        kind = "orbax"
    else:
        from tapclip_tpu.utils.torch_convert import load_torch_file

        tree = load_torch_file(args.path)
        kind = "torch"

    leaves = list(_walk(tree))
    total = 0
    rows = {}
    for name, leaf in leaves:
        arr = np.asarray(leaf)
        total += arr.size
        key = name
        if args.depth:
            key = ".".join(name.split(".")[: args.depth])
        n, shapes = rows.get(key, (0, set()))
        rows[key] = (n + arr.size, shapes | {f"{arr.dtype}{list(arr.shape)}"})

    print(f"{kind} checkpoint: {args.path}")
    for key in sorted(rows):
        n, shapes = rows[key]
        s = next(iter(shapes)) if len(shapes) == 1 else f"{len(shapes)} shapes"
        print(f"  {key:60s} {n:>12,}  {s}")
    print(f"total parameters: {total:,} "
          f"({total * 4 / 1e6:.1f} MB f32)")
    return total


if __name__ == "__main__":
    main()
