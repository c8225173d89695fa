"""Serving load benchmark: latency percentiles + sustained throughput.

Drives ``PredictService`` (the micro-batching core of ``tapclip_tpu.serve``)
in-process with N closed-loop client threads so the numbers measure the
serving path itself — request queueing, dynamic batching, the jitted
predict executable, result fan-out — without HTTP socket noise. Each
request carries a distinct image (no relay-cacheable repeats on the
tunneled backend).

Usage:
    python scripts/serve_bench.py [model=ViT-B-16] [requests=256]
        [settings=8:10,32:25,64:50]   # batch_size:max_latency_ms pairs

Prints one row per setting: sustained img/s, p50/p90/p99 latency, mean
batch fill. Run on the real chip for docs/PERF.md numbers.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_setting(model, batch_size, max_latency_ms, n_requests, dtype="uint8"):
    from tapclip_tpu.serve import PredictService

    service = PredictService(
        model, batch_size=batch_size, max_latency_ms=max_latency_ms
    )
    size = model.clip_cfg.image_size
    rng = np.random.default_rng(0)

    def gen_img(r):
        if dtype == "uint8":
            # Raw uint8 client payloads: normalization happens on device
            # (4x less host->device transfer — the production HTTP path).
            return r.integers(0, 256, (size, size, 3)).astype(np.uint8)
        return r.standard_normal((size, size, 3)).astype(np.float32)

    # Warm/compile with a full batch of distinct images. Cold compiles on
    # the tunneled chip can exceed 10 minutes, so the warm phase gets a
    # generous timeout and any failure is surfaced (a silent warm failure
    # would cascade into every client timing out).
    warm = [gen_img(rng) for _ in range(batch_size)]
    warm_errors = []

    def warm_one(w):
        try:
            service.predict(w, timeout=900.0)
        except Exception as e:  # noqa: BLE001
            warm_errors.append(repr(e))

    threads = [threading.Thread(target=warm_one, args=(w,)) for w in warm]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if warm_errors:
        service.close()
        raise RuntimeError(f"warmup failed: {warm_errors[0]}")

    # Closed loop: 2x batch_size clients, each sends its share back-to-back.
    n_clients = 2 * batch_size
    per_client = max(n_requests // n_clients, 1)
    latencies = []
    lat_lock = threading.Lock()
    errors = []

    def client(cid):
        r = np.random.default_rng(1000 + cid)
        mine = []
        for _ in range(per_client):
            px = gen_img(r)
            t0 = time.perf_counter()
            try:
                service.predict(px, timeout=120.0)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))
                return
            mine.append((time.perf_counter() - t0) * 1e3)
        with lat_lock:
            latencies.extend(mine)

    clients = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in clients:
        t.start()
    for t in clients:
        t.join()
    wall = time.perf_counter() - t0
    stats = service.stats()
    service.close()

    if errors:
        raise RuntimeError(f"{len(errors)} client errors, first: {errors[0]}")
    lat = np.asarray(latencies)
    total = len(lat)
    return {
        "batch_size": batch_size,
        "max_latency_ms": max_latency_ms,
        "img_per_sec": total / wall,
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "p99_ms": float(np.percentile(lat, 99)),
        "mean_batch_fill": stats["mean_batch_fill"],
        "mean_batch_ms": stats["mean_batch_ms"],
        "n": total,
    }


def main():
    import jax

    from tapclip_tpu.config import MODEL_PRESETS
    from tapclip_tpu.models import clip as clip_model
    from tapclip_tpu.models.model_wrapper import FullModel

    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-16"
    n_requests = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    settings = sys.argv[3] if len(sys.argv) > 3 else "8:10,32:25,64:50"
    dtype = sys.argv[4] if len(sys.argv) > 4 else "uint8"
    cfg = MODEL_PRESETS[name].replace(dtype="bfloat16")
    print(f"backend={jax.default_backend()} {name} requests={n_requests} "
          f"payload={dtype}")

    params = clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)
    model = FullModel(
        ["Backpack", "Alarm_Clock", "Laptop", "Pen", "Mug"], params, cfg
    )

    print(f"{'batch':>5} {'maxlat':>6} | {'img/s':>8} {'p50':>8} {'p90':>8} "
          f"{'p99':>8} | {'fill':>5} {'batch_ms':>8}")
    for pair in settings.split(","):
        bs, ml = pair.split(":")
        r = run_setting(model, int(bs), float(ml), n_requests, dtype)
        print(f"{r['batch_size']:>5} {r['max_latency_ms']:>6.0f} | "
              f"{r['img_per_sec']:>8.1f} {r['p50_ms']:>7.1f}ms "
              f"{r['p90_ms']:>7.1f}ms {r['p99_ms']:>7.1f}ms | "
              f"{r['mean_batch_fill']:>5.2f} {r['mean_batch_ms']:>7.1f}ms")


if __name__ == "__main__":
    main()
