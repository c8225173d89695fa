"""Batched inference serving for a (prompt-tuned) TAP-CLIP model.

The reference repo stops at offline eval scripts; this framework is built
for production serving, so it ships one: a threaded HTTP server with
dynamic micro-batching in front of a single jitted predict executable.

Design (TPU-shaped):

* **One static shape.**  Requests are aggregated into a fixed ``[B, H, W, 3]``
  batch (padded, masked) — the predict executable compiles once and never
  retraces, whatever the arrival pattern.
* **Dynamic micro-batching.**  A collector thread drains the request queue:
  a batch launches when ``batch_size`` requests are waiting or the oldest
  has waited ``max_latency_ms`` — the standard throughput/latency knob.
* **Text features are cached.**  Prompts only change on ``add_class``;
  the text tower runs once per vocabulary change (the attribution pass
  included), then serving cost is image tower + one GEMM of logits.
* **Classes can be added live** (``POST /classes``) without recompiling:
  the class axis is padded (`PromptBank`), same as the offline eval flow.

Endpoints (JSON):
  GET  /health            -> {"status": "ok", "classes": N, ...}
  GET  /metrics           -> Prometheus text exposition of the counters
  GET  /classes           -> {"classes": [...]}
  POST /classes           {"name": "Clipboards"} -> {"classes": [...]}
  POST /predict           {"image": <base64 jpeg/png>} or
                          {"pixels": [[...]]} ([H, W, 3] f32 0-1 or uint8)
                          -> {"class": str, "index": int, "probs": {name: p}}
  POST /explain           same payload -> prediction + per-class context-token
                          attribution rows (the interpretability signal);
                          add "saliency": true|"rollout"|"last" for the
                          class token's patch-saliency grid (ViT towers)
  POST /embed             same image payload -> {"embedding": [E floats]}
                          (L2-normalized image feature; rides the SAME
                          micro-batched executable as /predict)
  POST /embed_text        {"texts": [str, ...]} -> {"embeddings": [[...]]}
                          (L2-normalized CLIP text features — the other half
                          of a retrieval index)
  POST /reload            {"path": <ckpt dir or .bin>} -> hot-swap the tower
                          weights (same geometry; no restart, no retrace)

Run: ``python -m tapclip_tpu.serve --preset tiny --synthetic --port 8711``
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import os
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

log = logging.getLogger("tapclip.serve")


class PredictService:
    """Micro-batching front end over FullModel's jitted forward."""

    def __init__(
        self,
        model,
        *,
        batch_size: int = 8,
        max_latency_ms: float = 10.0,
        mesh=None,
        temperature: float = 1.0,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a ``data`` axis —
        every served batch is sharded over it (params replicated, logits
        gathered by XLA), scaling serving throughput across chips with the
        same single jitted executable. ``batch_size`` must divide evenly.

        ``temperature``: softmax temperature applied to served
        probabilities (fit one with ``train --calibrate``); rankings and
        the argmax class are unchanged by construction."""
        self.model = model
        self.batch_size = batch_size
        self.max_latency_ms = max_latency_ms
        self.mesh = mesh
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        self.temperature = float(temperature)
        if mesh is not None:
            from tapclip_tpu.parallel.mesh import DATA_AXIS

            dp = mesh.shape.get(DATA_AXIS, 1)
            if batch_size % dp:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the "
                    f"mesh's data axis ({dp})"
                )
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()  # model mutation (add_class) vs predict
        self._text_cache = None
        # served-traffic counters (reported by /health)
        self._n_requests = 0
        self._n_batches = 0
        self._batch_ms_total = 0.0
        self._stop = threading.Event()
        self._worker = threading.Thread(
            target=self._collector, daemon=True, name="predict-batcher"
        )
        self._worker.start()

    # -- public ---------------------------------------------------------

    def predict(self, pixels: np.ndarray, timeout: float = 30.0) -> Dict[str, Any]:
        """Enqueue one [H, W, 3] image; blocks until its batch returns."""
        return self._enqueue(pixels, "predict", timeout)

    def embed(self, pixels: np.ndarray, timeout: float = 30.0) -> Dict[str, Any]:
        """L2-normalized image embedding for one [H, W, 3] image.

        Retrieval-index building block: rides the SAME micro-batched
        executable as :meth:`predict` (the predict program already computes
        the normalized image feature on the way to the logits), so mixing
        /predict and /embed traffic costs nothing extra."""
        return self._enqueue(pixels, "embed", timeout)

    def _enqueue(self, pixels: np.ndarray, kind: str, timeout: float) -> Dict[str, Any]:
        done = threading.Event()
        slot: Dict[str, Any] = {}
        self._queue.put((pixels, slot, done, kind))
        if not done.wait(timeout):
            raise TimeoutError(f"{kind} timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def embed_text(self, texts: List[str]) -> Dict[str, Any]:
        """L2-normalized CLIP text embeddings for a list of strings.

        The other half of a retrieval index (text->image search). Batches
        are padded to the next power of two, so the executable count stays
        logarithmic in the largest request — never a per-request retrace."""
        import jax.numpy as jnp

        if not texts:
            return {"embeddings": []}
        m = self.model
        ids = np.asarray(
            m.tokenizer.tokenize(list(texts), m.clip_cfg.context_length)
        )
        n = len(texts)
        n_pad = 1 << (n - 1).bit_length()  # next power of two
        if n_pad != n:
            ids = np.concatenate(
                [ids, np.zeros((n_pad - n, ids.shape[1]), ids.dtype)]
            )
        with self._lock:
            feats = _cached_text_embed_fn(m.clip_cfg)(
                m.clip_params, jnp.asarray(ids)
            )
        feats = np.asarray(feats, np.float32)[:n]
        return {"embeddings": [[round(float(v), 6) for v in row]
                               for row in feats]}

    def explain(self, pixels: np.ndarray, saliency=None) -> Dict[str, Any]:
        """Prediction + context-token attribution for one image.

        Attribution is the model's interpretability signal (which context
        tokens the text encoder attends to for each class). Class-level for
        standard configs; per-sample when ``image_conditioned``. Not
        micro-batched — explainability is not a hot path.

        ``saliency``: ``True``/``"rollout"``/``"last"`` adds the class
        token's patch-saliency grid (``utils/saliency.patch_saliency``) —
        WHERE in the image the model looked, complementing the text-side
        attribution's WHICH-tokens."""
        import jax.numpy as jnp

        px = pixels[None] if pixels.dtype == np.uint8 else pixels[None].astype(
            np.float32
        )
        grid = None
        with self._lock:
            out = self.model(jnp.asarray(px))
            names = list(self.model.class_names)
            if saliency:
                # Inside the SAME lock as the prediction: a concurrent
                # /reload between the two would pair old-weight logits with
                # new-weight saliency.
                from tapclip_tpu.utils.saliency import patch_saliency

                method = "rollout" if saliency is True else str(saliency)
                grid = patch_saliency(
                    self.model.clip_params, self.model.clip_cfg,
                    jnp.asarray(px), method=method,
                )
        logits = np.asarray(out["logits"], np.float32)[0]
        probs = _softmax(logits[None] / self.temperature)[0]
        attr = np.asarray(out["attribution"], np.float32)
        if attr.ndim == 3:  # image-conditioned: [B, C, P]
            attr = attr[0]
        pred = int(logits.argmax())
        result = {
            "index": pred,
            "class": names[pred],
            "probs": {n: round(float(probs[j]), 6) for j, n in enumerate(names)},
            "attribution": {
                n: [round(float(v), 6) for v in attr[j]]
                for j, n in enumerate(names)
            },
        }
        if grid is not None:
            result["saliency"] = [
                [round(float(v), 6) for v in row] for row in grid[0]
            ]
        return result

    def add_class(self, name: str) -> List[str]:
        with self._lock:
            self.model.add_class_prompt(name)
            self._text_cache = None  # prompts changed -> recompute text side
        return list(self.model.class_names)

    def invalidate_text_cache(self) -> None:
        """Call after mutating ``model.trainable`` out of band (e.g. loading
        a new prompt checkpoint into a live service)."""
        with self._lock:
            self._text_cache = None

    def reload_weights(self, source) -> Dict[str, Any]:
        """Hot-swap the CLIP tower weights of a live service (zero restart).

        ``source``: an Orbax checkpoint dir, a torch ``.bin``/``.pt``
        (open_clip layout), or an in-memory param tree — e.g. the EMA tree
        or a freshly distilled student from ``pretrain_cli``.  The new tree
        must match the current geometry (same treedef + leaf shapes), so
        every cached executable stays valid: the swap is a buffer
        replacement, never a retrace.  The prompt bank is re-embedded from
        the NEW token embeddings (its class-name embeddings derive from the
        tower weights) while the trained context/adjustor state is kept.
        In-flight batches finish on the old weights; the swap itself happens
        under the model lock."""
        import jax
        import jax.numpy as jnp

        m = self.model
        if isinstance(source, str):
            if os.path.isdir(source):
                import orbax.checkpoint as ocp

                tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(source))
            else:
                from tapclip_tpu.utils.torch_convert import (
                    load_openclip_checkpoint,
                )

                tree = load_openclip_checkpoint(source, m.clip_cfg)
        else:
            tree = source
        cur = m.clip_params
        if jax.tree.structure(tree) != jax.tree.structure(cur):
            raise ValueError(
                "reload: checkpoint tree structure does not match the "
                "serving model (wrong architecture?)"
            )
        mismatched = [
            (tuple(a.shape), tuple(b.shape))
            for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(cur))
            if tuple(a.shape) != tuple(b.shape)
        ]
        if mismatched:
            raise ValueError(
                f"reload: {len(mismatched)} leaf shape mismatches, e.g. "
                f"{mismatched[0][0]} vs {mismatched[0][1]}"
            )
        tree = jax.tree.map(lambda a, b: jnp.asarray(a, b.dtype), tree, cur)
        from tapclip_tpu.models.prompt_learner import PromptLearner

        with self._lock:
            names = list(m.class_names)
            m.clip_params = tree
            m.prompt_learner = PromptLearner(
                names, tree, m.clip_cfg, m.prompt_cfg, m.tokenizer
            )
            self._text_cache = None
        return {"reloaded": True, "classes": names}

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # -- internals ------------------------------------------------------

    def _collector(self):
        poll_s = self.max_latency_ms / 1000.0 / 4
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_latency_ms / 1000.0
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=min(remaining, poll_s)))
                except queue.Empty:
                    continue
            self._run_batch(batch)

    def _cached_text_feats(self):
        """[C_max, E] L2-normalized text features for the current prompts.

        The text/attribution pass only depends on the prompts, not on the
        image batch (the image-independence identity, model_wrapper.py) —
        compute once per vocabulary/prompt change, then the serving hot path
        is image tower + one logits GEMM. (Image-conditioned prompt configs
        are the exception and bypass this cache.)"""
        if self._text_cache is None:
            m = self.model
            feats, _ = _cached_text_fn(m.clip_cfg, m.prompt_cfg)(
                m.clip_params,
                m.trainable["ctx"],
                m.prompt_learner.bank,
                m.trainable["adjustor"],
            )
            self._text_cache = feats
        return self._text_cache

    def stats(self) -> Dict[str, Any]:
        n_b = max(self._n_batches, 1)
        return {
            "requests": self._n_requests,
            "batches": self._n_batches,
            "mean_batch_fill": round(self._n_requests / n_b, 2),
            "mean_batch_ms": round(self._batch_ms_total / n_b, 2),
        }

    def _run_batch(self, batch):
        import jax
        import jax.numpy as jnp

        t_start = time.monotonic()
        pixels = [b[0] for b in batch]
        B = self.batch_size
        size = self.model.clip_cfg.image_size
        # All-uint8 batches ship raw bytes and normalize ON DEVICE (4x less
        # host->device transfer — the dominant serving cost over a network
        # transport; bit-identical results). A mixed batch falls back to f32
        # by normalizing the uint8 entries host-side. Each dtype compiles
        # its own executable exactly once.
        if all(p.dtype == np.uint8 for p in pixels):
            x = np.zeros((B, size, size, 3), np.uint8)
            for i, p in enumerate(pixels):
                x[i] = p
        else:
            from tapclip_tpu.data.preprocess import normalize

            x = np.zeros((B, size, size, 3), np.float32)
            for i, p in enumerate(pixels):
                if p.dtype == np.uint8:
                    x[i] = normalize(p.astype(np.float32) / 255.0)
                else:
                    x[i] = p
        want_embed = any(b[3] == "embed" for b in batch)
        try:
            with self._lock:
                feats = None
                if self.model.prompt_cfg.image_conditioned:
                    out = self.model(jnp.asarray(x))
                    if want_embed:
                        # the wrapper forward doesn't expose features;
                        # one extra jitted encode covers embed traffic
                        m = self.model
                        feats = _cached_image_embed_fn(m.clip_cfg)(
                            m.clip_params, jnp.asarray(x)
                        )
                else:
                    m = self.model
                    xb = jnp.asarray(x)
                    if self.mesh is not None:
                        # Shard the served batch over the data axis; the
                        # (replicated) weights and text features stay put and
                        # XLA gathers the per-shard logits — one executable,
                        # N-chip image-tower throughput.
                        from jax.sharding import NamedSharding
                        from jax.sharding import PartitionSpec as P

                        from tapclip_tpu.parallel.mesh import DATA_AXIS

                        xb = jax.device_put(
                            xb, NamedSharding(self.mesh, P(DATA_AXIS))
                        )
                    logits, feats = _cached_predict_fn(m.clip_cfg)(
                        m.clip_params,
                        self._cached_text_feats(),
                        m.trainable["logit_scale"],
                        m.prompt_learner.bank.class_mask,
                        xb,
                    )
                    out = {"logits": logits[:, : m.n_cls]}
                names = list(self.model.class_names)
            logits = np.asarray(out["logits"], np.float32)[: len(batch)]
            if feats is not None:
                feats = np.asarray(feats, np.float32)[: len(batch)]
            probs = _softmax(logits / self.temperature)
            preds = logits.argmax(-1)
            for i, (_, slot, done, kind) in enumerate(batch):
                if kind == "embed":
                    slot["result"] = {
                        "embedding": [round(float(v), 6) for v in feats[i]]
                    }
                else:
                    slot["result"] = {
                        "index": int(preds[i]),
                        "class": names[int(preds[i])],
                        "probs": {n: round(float(probs[i, j]), 6)
                                  for j, n in enumerate(names)},
                    }
                done.set()
            self._n_requests += len(batch)
            self._n_batches += 1
            self._batch_ms_total += (time.monotonic() - t_start) * 1e3
        except Exception as e:  # noqa: BLE001 - propagate to every waiter
            for _, slot, done, _kind in batch:
                slot["error"] = f"{type(e).__name__}: {e}"
                done.set()


import functools


@functools.lru_cache(maxsize=8)
def _cached_text_fn(clip_cfg, prompt_cfg):
    """Jitted text/attribution pass for the serving text cache."""
    import jax

    from tapclip_tpu.models.model_wrapper import text_features_with_attribution

    @jax.jit
    def text(clip_params, ctx, bank, adjustor):
        return text_features_with_attribution(
            clip_params, ctx, bank, clip_cfg, prompt_cfg, adjustor
        )

    return text


@functools.lru_cache(maxsize=8)
def _cached_predict_fn(clip_cfg):
    """ONE jitted executable for the serving hot path: image tower + logits
    against precomputed text features. Eager composition here would dispatch
    the ~12-block tower op by op (ruinous on tunneled devices). Also returns
    the normalized image features (they exist on the way to the logits
    anyway) so /embed traffic shares the executable."""
    import jax
    import jax.numpy as jnp

    from tapclip_tpu.models import clip as clip_model

    @jax.jit
    def predict(clip_params, text_feats, logit_scale, class_mask, images):
        img = clip_model.l2_normalize(
            clip_model.encode_image(clip_params, clip_cfg, images)
        )
        scale = jnp.exp(logit_scale)
        logits = scale * img.astype(jnp.float32) @ text_feats.astype(jnp.float32).T
        return jnp.where(class_mask[None], logits, -1e30), img

    return predict


@functools.lru_cache(maxsize=8)
def _cached_image_embed_fn(clip_cfg):
    """Normalized image features alone (image-conditioned configs, whose
    predict path doesn't expose them). One executable shared with offline
    featurization — serving and index-building can never numerically
    diverge."""
    from tapclip_tpu.featurize import make_image_embed_fn

    return make_image_embed_fn(clip_cfg)


@functools.lru_cache(maxsize=8)
def _cached_text_embed_fn(clip_cfg):
    """Normalized CLIP text features (proper encoder: pos emb + causal mask
    + ln_final + EOT pooling) for /embed_text; same builder as offline
    featurization."""
    from tapclip_tpu.featurize import make_text_embed_fn

    return make_text_embed_fn(clip_cfg)


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def decode_image_payload(
    payload: Dict[str, Any], image_size: int, keep_uint8: bool = False
) -> np.ndarray:
    """Request JSON -> [H, W, 3] pixels.

    Default: f32, CLIP-normalized. With ``keep_uint8`` (the HTTP handler's
    mode), integer-valued inputs stay RAW uint8 and normalization happens on
    device (``data/preprocess.py::device_normalize``, bit-identical) — 4x
    less host->device transfer, which dominates serving latency when the
    accelerator sits behind a network transport. Float 0-1 payloads cannot
    be expressed losslessly in uint8 and take the f32 path regardless.
    """
    from tapclip_tpu.data.preprocess import make_preprocess

    if "image" in payload:
        from PIL import Image

        raw = base64.b64decode(payload["image"])
        img = Image.open(io.BytesIO(raw))
        if keep_uint8:
            from tapclip_tpu.data.preprocess import preprocess_pil_uint8

            return preprocess_pil_uint8(img, image_size)
        pre = make_preprocess(image_size)
        return np.asarray(pre(img), np.float32)
    if "pixels" in payload:
        arr = np.asarray(payload["pixels"])
        # Integer payloads are ALWAYS 0-255 (JSON ints arrive as int64, so a
        # dtype check — not a max() heuristic, which would misread an
        # all-dark image whose values happen to sit <= 2 — decides).
        is_int = np.issubdtype(arr.dtype, np.integer)
        if arr.shape != (image_size, image_size, 3):
            raise ValueError(
                f"pixels must be [{image_size}, {image_size}, 3], got {arr.shape}"
            )
        if is_int and keep_uint8:
            if arr.min() < 0 or arr.max() > 255:
                raise ValueError("integer pixels must be in [0, 255]")
            return arr.astype(np.uint8)
        if is_int or arr.max() > 2.0:
            arr = arr.astype(np.float32) / 255.0
        from tapclip_tpu.config import IMAGE_MEAN, IMAGE_STD

        return ((arr - np.asarray(IMAGE_MEAN, np.float32))
                / np.asarray(IMAGE_STD, np.float32)).astype(np.float32)
    raise ValueError("payload must contain 'image' (base64) or 'pixels'")


def make_http_server(service: PredictService, host: str = "127.0.0.1",
                     port: int = 8711):
    """Threaded stdlib HTTP server bound to the service (returns unstarted)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    image_size = service.model.clip_cfg.image_size

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            log.debug("%s " + fmt, self.address_string(), *args)

        def _send(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> Dict[str, Any]:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {
                    "status": "ok",
                    "model": service.model.clip_cfg.name,
                    "classes": len(service.model.class_names),
                    "batch_size": service.batch_size,
                    **service.stats(),
                })
            elif self.path == "/metrics":
                # Prometheus text exposition of the /health counters, for
                # scrape-based monitoring in a real deployment.
                s = service.stats()
                lines = [
                    "# TYPE tapclip_requests_total counter",
                    f"tapclip_requests_total {s['requests']}",
                    "# TYPE tapclip_batches_total counter",
                    f"tapclip_batches_total {s['batches']}",
                    "# TYPE tapclip_batch_fill_mean gauge",
                    f"tapclip_batch_fill_mean {s['mean_batch_fill']}",
                    "# TYPE tapclip_batch_ms_mean gauge",
                    f"tapclip_batch_ms_mean {s['mean_batch_ms']}",
                    "# TYPE tapclip_classes gauge",
                    f"tapclip_classes {len(service.model.class_names)}",
                ]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/classes":
                self._send(200, {"classes": list(service.model.class_names)})
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                payload = self._read_json()
                if self.path == "/predict":
                    pixels = decode_image_payload(payload, image_size,
                                                  keep_uint8=True)
                    self._send(200, service.predict(pixels))
                elif self.path == "/explain":
                    pixels = decode_image_payload(payload, image_size,
                                                  keep_uint8=True)
                    self._send(200, service.explain(
                        pixels, saliency=payload.get("saliency")))
                elif self.path == "/embed":
                    pixels = decode_image_payload(payload, image_size,
                                                  keep_uint8=True)
                    self._send(200, service.embed(pixels))
                elif self.path == "/embed_text":
                    self._send(200, service.embed_text(payload["texts"]))
                elif self.path == "/classes":
                    self._send(200, {"classes": service.add_class(payload["name"])})
                elif self.path == "/reload":
                    self._send(200, service.reload_weights(payload["path"]))
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as e:  # noqa: BLE001 - serving boundary
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None):
    from tapclip_tpu.config import MODEL_PRESETS
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import FullModel

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="ViT-B-16", choices=list(MODEL_PRESETS))
    p.add_argument("--preset", default=None, help="use a config preset's model "
                   "(e.g. tiny) instead of --model")
    p.add_argument("--classes", nargs="+",
                   default=["Backpack", "Pen", "Monitor"])
    p.add_argument("--ckpt", default=None,
                   help="prompt checkpoint (Orbax dir or reference .pt)")
    p.add_argument("--pretrained", default=None, help="open_clip weights")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8711)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-latency-ms", type=float, default=10.0)
    p.add_argument("--temperature", type=float, default=1.0,
                   help="softmax temperature for served probabilities "
                        "(fit via train --calibrate; argmax unchanged)")
    p.add_argument("--synthetic", action="store_true",
                   help="random-init weights (smoke/demo)")
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 W8A8 tower (ViT only)")
    p.add_argument("--int8-deterministic", action="store_true",
                   help="with --int8: round-to-nearest everywhere for "
                        "reproducible scoring (bypasses the stochastic-"
                        "rounding kernels; some throughput cost)")
    p.add_argument("--token-keep-ratio", type=float, default=1.0,
                   help="attention-aware token pruning ratio (1.0 = off)")
    p.add_argument("--dp", type=int, default=0,
                   help="shard every served batch over a data-parallel mesh "
                        "of this many devices (0 = single device)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    if args.preset:
        from tapclip_tpu.config import preset

        cfg = preset(args.preset).model
    else:
        cfg = MODEL_PRESETS[args.model]
    if args.int8:
        cfg = cfg.replace(quantize_tower=True,
                          int8_deterministic=args.int8_deterministic)
    if args.token_keep_ratio < 1.0:
        cfg = cfg.replace(token_keep_ratio=args.token_keep_ratio)
    import jax

    if args.pretrained:
        from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

        params = load_openclip_checkpoint(args.pretrained, cfg.name)
    else:
        if not args.synthetic:
            log.warning("no --pretrained given; serving random-init weights "
                        "(pass --synthetic to silence)")
        params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)

    model = FullModel(args.classes, params, cfg)
    if args.ckpt:
        from tapclip_tpu.utils.checkpoint import apply_prompt_checkpoint

        apply_prompt_checkpoint(model, args.ckpt)

    mesh = None
    if args.dp > 1:
        from tapclip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
    service = PredictService(model, batch_size=args.batch_size,
                             max_latency_ms=args.max_latency_ms, mesh=mesh,
                             temperature=args.temperature)
    server = make_http_server(service, args.host, args.port)
    log.info("serving %s with %d classes on http://%s:%d (batch=%d, "
             "max_latency=%.0fms)", cfg.name, len(args.classes), args.host,
             args.port, args.batch_size, args.max_latency_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()


if __name__ == "__main__":
    main()
