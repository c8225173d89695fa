"""Similarity search over featurized corpora (the retrieval deployment).

Closes the loop on ``featurize.py``: load its packed ``[N, D]`` unit-norm
embedding matrix + row-aligned manifest, and serve exact top-k cosine
queries — by image, by text, or by corpus row ("more like this").

TPU-shaped: the index lives on device as one bf16 matrix, a query is ONE
jitted ``[Q, D] @ [D, N]`` GEMM + ``top_k`` (MXU work, no host-side scan),
and query batches are padded to a power of two so the executable count is
log-bounded.  Exact search is the right default at CLIP-corpus scale on a
TPU: a v5e chip sustains ~200 GF/ms, so scoring 10M rows for one query is
~a millisecond of GEMM — ANN approximations buy nothing until the index
stops fitting HBM.

Usage:
    python -m tapclip_tpu.featurize --image-root corpus/ --out feats/
    python -m tapclip_tpu.search --index feats/ --text "a red backpack" -k 5
    python -m tapclip_tpu.search --index feats/ --image query.jpg -k 5
"""

from __future__ import annotations

import argparse
import csv
import functools
import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("tapclip_tpu")


def _pow2_pad(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class SearchIndex:
    """Exact cosine top-k over a featurize.py output directory.

    ``embeddings`` rows are assumed L2-normalized (featurize.py guarantees
    it); cosine similarity is then one GEMM against the transposed index.
    """

    def __init__(self, embeddings: np.ndarray, manifest: List[List[str]]):
        import jax.numpy as jnp

        if embeddings.ndim != 2:
            raise ValueError(f"index must be [N, D], got {embeddings.shape}")
        if len(manifest) != embeddings.shape[0]:
            raise ValueError(
                f"manifest rows {len(manifest)} != index rows "
                f"{embeddings.shape[0]}"
            )
        self.manifest = manifest
        # bf16 index halves HBM; scores accumulate in f32 on the MXU.
        self._index = jnp.asarray(embeddings, jnp.bfloat16)
        self.n, self.dim = embeddings.shape

    @classmethod
    def load(cls, index_dir, *, text: bool = False) -> "SearchIndex":
        """Load featurize output dir(s): ``image_embeddings.npy`` (or
        ``text_``) + manifest.  A list/tuple of dirs concatenates them in
        order (the multi-host featurize pattern: each rank writes its own
        partition; loading them together forms the global index)."""
        dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
        name = "text_embeddings.npy" if text else "image_embeddings.npy"
        embs, rows = [], []
        for d in dirs:
            embs.append(np.load(os.path.join(d, name)))
            with open(os.path.join(d, "manifest.csv")) as f:
                rows.extend(list(csv.reader(f))[1:])  # drop header
        return cls(np.concatenate(embs) if len(embs) > 1 else embs[0], rows)

    @functools.cached_property
    def _query_fn(self):
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=(2,))
        def query(q, index, k):
            scores = jnp.dot(
                q.astype(jnp.bfloat16), index.T,
                preferred_element_type=jnp.float32,
            )
            return jax.lax.top_k(scores, k)

        return query

    def search(
        self, queries: np.ndarray, k: int = 5
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``[Q, D]`` unit-norm queries -> ``(scores [Q, k], rows [Q, k])``.

        The query batch is padded to a power of two (log-many executables);
        ``k`` is clamped to the corpus size.
        """
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != index dim {self.dim}"
            )
        k = min(int(k), self.n)
        q = queries.shape[0]
        qp = _pow2_pad(q)
        if qp != q:
            queries = np.pad(queries, [(0, qp - q), (0, 0)])
        scores, rows = self._query_fn(queries, self._index, k)
        return np.asarray(scores[:q]), np.asarray(rows[:q])

    def lookup(self, rows: Sequence[int]) -> List[List[str]]:
        return [self.manifest[int(r)] for r in rows]

    def find_duplicates(
        self, threshold: float = 0.96, *, chunk: int = 1024
    ) -> List[Tuple[int, int, float]]:
        """Near-duplicate pairs ``(i, j, cosine)`` with ``i < j`` and
        ``cosine >= threshold``, sorted by descending similarity.

        Data-curation dedup over the featurized corpus: a chunked
        self-GEMM scores ``[chunk, N]`` per dispatch against the resident
        bf16 index (exact — no LSH; at CLIP scale a [B, N] matmul per
        chunk IS the cheap TPU shape, same argument as :meth:`search`).
        The upper triangle is masked on device so only ``j > i`` pairs
        return; exact-duplicate cosines land at ~0.996+ through the bf16
        index, so thresholds >= 0.99 are not meaningful — 0.95-0.98
        separates near-duplicates in practice.
        """
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=(3,))
        def chunk_hits(index, start, thr, n_rows):
            q = jax.lax.dynamic_slice_in_dim(index, start, n_rows)
            scores = jnp.dot(
                q, index.T, preferred_element_type=jnp.float32
            )  # [chunk, N]
            cols = jnp.arange(scores.shape[1])[None, :]
            rows = start + jnp.arange(n_rows)[:, None]
            return jnp.where(cols > rows, scores, -jnp.inf) >= thr, scores

        pairs: List[Tuple[int, int, float]] = []
        thr = jnp.float32(threshold)
        for start in range(0, self.n, chunk):
            n_rows = min(chunk, self.n - start)
            if n_rows < chunk and self.n > chunk:
                start = self.n - chunk  # full-size tail window (one program)
                n_rows = chunk
            hit, scores = chunk_hits(self._index, start, thr, n_rows)
            hi, hj = np.nonzero(np.asarray(hit))
            s = np.asarray(scores)
            for a, b in zip(hi.tolist(), hj.tolist()):
                pairs.append((start + a, b, float(s[a, b])))
        pairs = sorted(set(pairs), key=lambda t: -t[2])
        return pairs


def main(argv: Optional[List[str]] = None) -> List[dict]:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--index", required=True, nargs="+",
                   help="featurize.py output directory")
    p.add_argument("--text", help="text query (encodes with the text tower)")
    p.add_argument("--image", help="image-file query")
    p.add_argument("--row", type=int, help="corpus-row query (more-like-this)")
    p.add_argument("--dedup", type=float, default=None, metavar="THRESHOLD",
                   help="report near-duplicate pairs with cosine >= THRESHOLD "
                        "instead of querying (data-curation mode)")
    p.add_argument("--dedup-out", default=None,
                   help="write the duplicate pairs to this CSV")
    p.add_argument("--corpus", default="image", choices=["image", "text"],
                   help="which featurized matrix to search: image embeddings "
                        "(default) or the text embeddings written by "
                        "featurize --embed-text")
    p.add_argument("-k", type=int, default=5)
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--preset", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--bpe-path", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)
    n_modes = sum(
        x is not None for x in (args.text, args.image, args.row, args.dedup)
    )
    if n_modes != 1:
        raise SystemExit(
            "pass exactly one of --text / --image / --row / --dedup"
        )

    index = SearchIndex.load(args.index, text=args.corpus == "text")

    if args.dedup is not None:
        pairs = index.find_duplicates(args.dedup)

        def path(i):  # manifest rows are (index, path, ...) per featurize.py
            m = index.manifest[i]
            return m[1] if len(m) > 1 else m[0]

        results = [
            {
                "row_a": i,
                "path_a": path(i),
                "row_b": j,
                "path_b": path(j),
                "score": round(s, 4),
            }
            for i, j, s in pairs
        ]
        log.info("dedup: %d pairs >= %.3f over %d rows",
                 len(results), args.dedup, index.n)
        for r in results[:20]:
            log.info("  %.4f  %s == %s", r["score"], r["path_a"], r["path_b"])
        if args.dedup_out:
            import csv as _csv

            with open(args.dedup_out, "w", newline="") as f:
                w = _csv.DictWriter(
                    f, fieldnames=["row_a", "path_a", "row_b", "path_b", "score"]
                )
                w.writeheader()
                w.writerows(results)
            log.info("dedup csv: %s", args.dedup_out)
        return results

    if args.row is not None:
        if args.row < 0:
            raise SystemExit(f"--row must be >= 0, got {args.row}")
        # mmap: slicing one query row must not re-read the multi-GB index.
        # Global row index across the concatenated dirs (multi-dir loads).
        row = args.row
        q = None
        npy = ("text_embeddings.npy" if args.corpus == "text"
               else "image_embeddings.npy")
        for d in args.index:
            emb = np.load(os.path.join(d, npy), mmap_mode="r")
            if row < emb.shape[0]:
                q = np.array(emb[row : row + 1], np.float32)
                break
            row -= emb.shape[0]
        if q is None:
            raise SystemExit(f"--row {args.row} out of range ({index.n} rows)")
    else:
        from tapclip_tpu.config import MODEL_PRESETS, preset
        from tapclip_tpu.featurize import (
            load_clip_params,
            make_image_embed_fn,
            make_text_embed_fn,
        )

        cfg = preset(args.preset).model if args.preset else MODEL_PRESETS[args.model]
        if cfg.embed_dim != index.dim:
            raise SystemExit(
                f"model embed_dim {cfg.embed_dim} != index dim {index.dim}"
            )
        params = load_clip_params(cfg, args.pretrained)
        if args.text is not None:
            from tapclip_tpu.data.tokenizer import get_tokenizer

            tok = get_tokenizer(args.bpe_path, cfg.context_length)
            import jax.numpy as jnp

            q = np.asarray(
                make_text_embed_fn(cfg)(params, jnp.asarray(tok.tokenize([args.text])))
            )
        else:
            from PIL import Image

            from tapclip_tpu.data.preprocess import preprocess_pil

            with Image.open(args.image) as im:
                arr = preprocess_pil(im.convert("RGB"), cfg.image_size)
            import jax.numpy as jnp

            q = np.asarray(make_image_embed_fn(cfg)(params, jnp.asarray(arr[None])))

    scores, rows = index.search(q, k=args.k)
    results = [
        {"rank": i, "row": int(r), "score": round(float(s), 4),
         "meta": index.manifest[int(r)]}
        for i, (s, r) in enumerate(zip(scores[0], rows[0]))
    ]
    for r in results:
        print(f"#{r['rank']}  row={r['row']}  score={r['score']}  {r['meta']}")
    return results


if __name__ == "__main__":
    main()
