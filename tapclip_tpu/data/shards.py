"""WebDataset-style tar-shard streaming for at-scale contrastive pretraining.

The reference's data layer is a folder-per-class ImageFolder
(``/root/reference/dataset.py``) — right for few-shot prompt tuning, wrong
for LAION-scale image-text pretraining, where the dataset is millions of
``(image, caption)`` pairs that cannot live in one directory listing.  The
industry-standard layout is webdataset: ``.tar`` shards whose members pair
by basename stem (``000123.jpg`` + ``000123.txt``).  This module streams
that layout TPU-natively:

* **sequential shard reads** — tars stream member-by-member (no random
  file-system access; the layout exists so disks/object stores see large
  sequential reads);
* **seeded shuffle**: shard order is permuted per ``(seed, epoch)`` and
  samples pass through a bounded reservoir-style shuffle buffer — the
  standard two-level approximate shuffle, deterministic under a fixed seed;
* **multihost sharding**: ``rank``/``world`` stride the shard list so each
  process streams a disjoint subset (shards, not samples, are the unit —
  no coordination needed);
* **resumability**: ``state()``/``restore()`` checkpoint progress at shard
  granularity (epoch + shards consumed), matching the snapshot cadence of
  ``pretrain_cli --save-every``;
* **full batches only**: contrastive losses want a constant batch of
  negatives; the tail of an epoch that can't fill a batch carries over
  conceptually to the next epoch's stream (it is dropped — standard for
  webdataset-style epochs over shuffled shards).

Decoding uses the PIL pipeline (`preprocess.preprocess_pil`) — the native
C++ path is bit-exact with it but reads from file paths; tar members are
in-memory bytes.  Token ids are produced per batch by the injected
``tokenize`` callable so the loader yields jit-ready ``(images, token_ids)``.
"""

from __future__ import annotations

import dataclasses
import io
import logging
import os
import tarfile
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_log = logging.getLogger("tapclip_tpu")

_IMG_EXT = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
_TXT_EXT = (".txt", ".caption", ".cls")


def write_shards(
    samples: Sequence[Tuple[bytes, str]],
    out_dir: str,
    *,
    shard_size: int = 1000,
    prefix: str = "shard",
) -> List[str]:
    """Pack ``(jpeg_bytes, caption)`` pairs into webdataset tar shards.

    A convenience for converting datasets (and for tests); the on-disk
    layout is plain webdataset, readable by any consumer of that format.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(0, max(len(samples), 1), shard_size):
        chunk = samples[s:s + shard_size]
        if not chunk:
            break
        path = os.path.join(out_dir, f"{prefix}-{s // shard_size:06d}.tar")
        with tarfile.open(path, "w") as tf:
            for i, (img_bytes, caption) in enumerate(chunk):
                key = f"{s + i:09d}"
                for name, payload in (
                    (f"{key}.jpg", img_bytes),
                    (f"{key}.txt", caption.encode("utf-8")),
                ):
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))
        paths.append(path)
    return paths


def list_shards(root: str) -> List[str]:
    """Sorted ``.tar`` shard paths under ``root``."""
    out = sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".tar")
    )
    if not out:
        raise FileNotFoundError(f"no .tar shards under {root}")
    return out


def _iter_shard(path: str) -> Iterator[Tuple[bytes, str]]:
    """Stream (image_bytes, caption) pairs from one tar, pairing members by
    basename stem (webdataset convention: a sample's files are adjacent)."""
    pending: Dict[str, Dict[str, bytes]] = {}
    with tarfile.open(path, "r") as tf:
        for member in tf:
            if not member.isfile():
                continue
            stem, ext = os.path.splitext(member.name)
            ext = ext.lower()
            if ext not in _IMG_EXT and ext not in _TXT_EXT:
                continue
            data = tf.extractfile(member).read()
            slot = pending.setdefault(stem, {})
            slot["img" if ext in _IMG_EXT else "txt"] = data
            if "img" in slot and "txt" in slot:
                del pending[stem]
                yield slot["img"], slot["txt"].decode("utf-8", "replace")
    # unpaired members (missing caption or image) are dropped silently —
    # webdataset semantics; count_samples() reports only complete pairs.


def count_samples(shards: Sequence[str]) -> int:
    """Complete (image, caption) pairs across shards — tar *header* scan
    only (no decode), used for __len__/LR-schedule sizing."""
    total = 0
    for path in shards:
        stems: Dict[str, int] = {}
        with tarfile.open(path, "r") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                stem, ext = os.path.splitext(member.name)
                ext = ext.lower()
                if ext in _IMG_EXT:
                    stems[stem] = stems.get(stem, 0) | 1
                elif ext in _TXT_EXT:
                    stems[stem] = stems.get(stem, 0) | 2
        total += sum(1 for v in stems.values() if v == 3)
    return total


@dataclasses.dataclass
class ShardLoaderState:
    epoch: int
    shards_done: int


class ShardLoader:
    """Iterable of jit-ready ``(images [B,H,W,3] f32, token_ids [B,T] i32)``
    batches streamed from webdataset tar shards.

    One pass over ``__iter__`` is one epoch: the rank's shard subset in a
    ``(seed, epoch)``-seeded order, samples shuffled through a bounded
    buffer, full batches only.  The epoch counter advances automatically at
    the end of each pass (mirroring ``imagefolder.Loader``).
    """

    def __init__(
        self,
        shards: Sequence[str],
        batch_size: int,
        *,
        tokenize: Callable[[List[str]], np.ndarray],
        image_size: int = 224,
        shuffle_buffer: int = 1000,
        seed: int = 0,
        rank: int = 0,
        world: int = 1,
        use_native: Optional[bool] = None,
        fast_decode: bool = False,
        output_dtype: str = "float32",
    ):
        if output_dtype not in ("float32", "uint8"):
            raise ValueError(
                f"output_dtype must be float32|uint8, got {output_dtype}"
            )
        if world < 1 or not (0 <= rank < world):
            raise ValueError(f"bad rank/world {rank}/{world}")
        self.all_shards = list(shards)
        self.shards = self.all_shards[rank::world]
        if not self.shards:
            raise ValueError(
                f"rank {rank}/{world} got no shards ({len(self.all_shards)} total)"
            )
        self.batch_size = batch_size
        self.tokenize = tokenize
        self.image_size = image_size
        self.shuffle_buffer = max(1, shuffle_buffer)
        self.seed = seed
        self._epoch = 0
        self._skip_shards = 0  # set by restore(); consumed by next __iter__
        self._shards_done = 0
        self._n_samples = count_samples(self.shards)
        self.skipped = 0  # undecodable members seen (skipped, not fatal)
        self._use_native = use_native  # None = auto (C++ decode if it builds)
        self.fast_decode = bool(fast_decode)  # DCT-scaled JPEG (native only)
        # uint8 transport: 4x fewer host->device bytes; normalization fuses
        # on device bit-identically (encode_image accepts uint8 pixels).
        self.output_dtype = output_dtype

    def __len__(self) -> int:
        return self._n_samples // self.batch_size

    @property
    def num_samples(self) -> int:
        return self._n_samples

    # -- resumability (shard granularity) --------------------------------
    def state(self) -> dict:
        return {"epoch": self._epoch, "shards_done": self._shards_done}

    def restore(self, state: dict) -> None:
        self._epoch = int(state["epoch"])
        self._skip_shards = int(state["shards_done"])

    # --------------------------------------------------------------------
    def _sample_stream(self, order: np.ndarray, skip: int) -> Iterator[Tuple[bytes, str]]:
        for pos in range(skip, len(order)):
            yield from _iter_shard(self.shards[int(order[pos])])
            self._shards_done = pos + 1

    def __iter__(self):
        from tapclip_tpu.data.preprocess import preprocess_pil, preprocess_pil_uint8
        from PIL import Image

        use_native = False
        if self._use_native is not False:
            from tapclip_tpu.data import native

            use_native = native.available()
        to_uint8 = self.output_dtype == "uint8"

        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch])
        )
        order = rng.permutation(len(self.shards))
        skip, self._skip_shards = self._skip_shards, 0
        self._shards_done = skip

        buf: List[Tuple[bytes, str]] = []
        imgs: List[np.ndarray] = []
        caps: List[str] = []

        pil_pre = preprocess_pil_uint8 if to_uint8 else preprocess_pil

        def pil_decode(img_bytes):
            with Image.open(io.BytesIO(img_bytes)) as im:
                return pil_pre(im.convert("RGB"), self.image_size)

        def decode_many(items):
            """Decode a chunk in eviction order; the C++ pipeline (threaded,
            PIL-bit-exact) when it builds, PIL otherwise; corrupt members
            skip either way."""
            if use_native:
                from tapclip_tpu.data import native

                decode = (native.decode_bytes_batch_u8 if to_uint8
                          else native.decode_bytes_batch)
                arrs, ok = decode(
                    [b for b, _ in items], self.image_size,
                    fast_decode=self.fast_decode,
                )
                for arr, good, (img_bytes, caption) in zip(arrs, ok, items):
                    if good:
                        imgs.append(arr)
                        caps.append(caption)
                        continue
                    # formats the native decoder doesn't cover: PIL fallback
                    try:
                        imgs.append(pil_decode(img_bytes))
                        caps.append(caption)
                    except Exception as e:
                        self.skipped += 1
                        _log.warning(
                            "skipping undecodable shard member (%r...): %s",
                            caption[:40], e,
                        )
                return
            for img_bytes, caption in items:
                try:
                    arr = pil_decode(img_bytes)
                except Exception as e:  # corrupt member: skip, not fatal
                    self.skipped += 1
                    _log.warning(
                        "skipping undecodable shard member (%r...): %s",
                        caption[:40], e,
                    )
                    continue
                imgs.append(arr)
                caps.append(caption)

        pending: List[Tuple[bytes, str]] = []

        def drain_batches():
            while len(imgs) >= self.batch_size:
                B = self.batch_size
                batch_i, batch_c = imgs[:B], caps[:B]
                del imgs[:B], caps[:B]
                yield np.stack(batch_i), self.tokenize(batch_c)

        for item in self._sample_stream(order, skip):
            if len(buf) < self.shuffle_buffer:
                buf.append(item)
                continue
            j = int(rng.integers(len(buf)))
            out, buf[j] = buf[j], item
            pending.append(out)
            if len(pending) >= self.batch_size:
                decode_many(pending)
                pending = []
                yield from drain_batches()
        # drain the buffer in random order
        for j in rng.permutation(len(buf)):
            pending.append(buf[int(j)])
        decode_many(pending)
        yield from drain_batches()
        # tail smaller than a batch: dropped (full batches only)
        self._epoch += 1
        self._shards_done = 0
