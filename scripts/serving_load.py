"""Mixed-load serving benchmark (serving_load.md v2, VERDICT r2 item 8).

Drives a live `optispeech_tpu.cli.serve` server on the real chip with a
MIXED workload — three d/p/e factor classes batching into separate ladders
plus concurrent `/stream` clients — and reports per-class p50/p95 request
latency, stream time-to-first-byte, and batcher coalescing counters.

Usage (serialize with other TPU work):
    python scripts/serving_load.py CHECKPOINT_OR_ARTIFACT \
        [--clients 8] [--requests 6] [--out docs/evidence/serving_load_v2.md]
"""

import argparse
import http.client
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TEXT = "the quick brown fox jumps over the lazy dog near the river"
FACTOR_CLASSES = {
    "default": {},
    "slow": {"d_factor": 1.4},
    "pitched": {"p_factor": 1.3, "e_factor": 1.1},
}


def post(base, payload, path="/synthesise", timeout=1800):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = r.read()
    return time.perf_counter() - t0, body


def stream_once(host, port, payload):
    """Returns (time_to_first_byte, total_time, n_bytes)."""
    conn = http.client.HTTPConnection(host, port, timeout=1800)
    t0 = time.perf_counter()
    conn.request("POST", "/stream", json.dumps(payload).encode(),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    first = resp.read(4096)
    ttfb = time.perf_counter() - t0
    rest = resp.read()
    total = time.perf_counter() - t0
    conn.close()
    return ttfb, total, len(first) + len(rest)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=6)
    p.add_argument("--stream-clients", type=int, default=2)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--wait-ms", type=float, default=30.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", default=str(REPO / "docs/evidence/serving_load_v2.md"))
    args = p.parse_args(argv)

    import jax

    from optispeech_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from optispeech_tpu.cli.serve import load_model, serve

    model = load_model(args.model, bf16=args.bf16)
    httpd = serve(model, host="127.0.0.1", port=0, max_batch=args.max_batch,
                  batch_wait_ms=args.wait_ms, request_timeout_s=1800.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    host, port = httpd.server_address
    base = f"http://{host}:{port}"

    # warm-up: for EVERY factor class, walk the power-of-two row ladder with
    # concurrent same-class bursts so each (rows rung, frame rung) pair the
    # measured phase can hit is already compiled (compiles are once per
    # machine via the persistent cache, but a first-per-shape compile landing
    # inside the measured window would dominate the p95)
    print("warm-up ...", flush=True)
    t0 = time.time()
    for cls, extra in FACTOR_CLASSES.items():
        rung = 1
        while rung <= args.max_batch:
            warm_threads = [threading.Thread(
                target=post, args=(base, {"text": TEXT, "format": "json", **extra}))
                for _ in range(rung)]
            for t in warm_threads:
                t.start()
            for t in warm_threads:
                t.join()
            rung *= 2
    stream_once(host, port, {"text": TEXT})
    warm_s = time.time() - t0

    # measured phase: clients round-robin factor classes; streams run
    # concurrently with the batched traffic
    lat = {cls: [] for cls in FACTOR_CLASSES}
    stream_stats = []
    b0, r0 = httpd.batcher.batches_run, httpd.batcher.requests_served
    audio_s = [0.0]
    acc_lock = threading.Lock()

    def worker(i):
        classes = list(FACTOR_CLASSES.items())
        for k in range(args.requests):
            cls, extra = classes[(i + k) % len(classes)]
            dt, body = post(base, {"text": TEXT, "format": "json", **extra})
            obj = json.loads(body)
            import base64

            n = len(base64.b64decode(obj["pcm16_b64"])) // 2
            with acc_lock:
                audio_s[0] += n / model.sample_rate
                lat[cls].append(dt)

    def stream_worker():
        for _ in range(2):
            stream_stats.append(stream_once(host, port, {"text": TEXT}))

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(args.clients)]
    threads += [threading.Thread(target=stream_worker) for _ in range(args.stream_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    batches = httpd.batcher.batches_run - b0
    served = httpd.batcher.requests_served - r0
    with urllib.request.urlopen(base + "/health", timeout=60) as r:
        health = json.load(r)
    httpd.shutdown()

    n_req = args.clients * args.requests
    lines = [
        "# Serving under MIXED load (v2: factor classes + concurrent streams)",
        "",
        f"Model: `{args.model}` (bf16={args.bf16}); one TPU v5e chip through "
        "the harness tunnel; closed-loop clients.",
        "",
        f"- workload: {args.clients} clients x {args.requests} requests "
        f"round-robining {len(FACTOR_CLASSES)} d/p/e factor classes "
        f"(only same-class requests can coalesce), plus "
        f"{args.stream_clients} concurrent `/stream` clients x 2 streams",
        f"- warm-up (compile ladder, once per machine): {warm_s:.0f} s",
        f"- measured: **{n_req} requests in {wall:.1f} s = "
        f"{n_req / wall:.2f} req/s**, coalesced into {batches} device "
        f"batches; {audio_s[0]:.1f} s audio served = "
        f"**{audio_s[0] / wall:.1f}x real-time end-to-end** (tunnel-bound; "
        "device-busy synthesis is ~4 orders faster, see bench.py)",
        "",
        "| factor class | n | p50 (s) | p95 (s) | max (s) |",
        "|---|---|---|---|---|",
    ]
    for cls, xs in lat.items():
        xs = np.asarray(xs)
        lines.append(f"| {cls} | {len(xs)} | {np.percentile(xs, 50):.2f} "
                     f"| {np.percentile(xs, 95):.2f} | {xs.max():.2f} |")
    if stream_stats:
        ttfb = np.asarray([s[0] for s in stream_stats])
        tot = np.asarray([s[1] for s in stream_stats])
        lines += [
            "",
            f"`/stream` (concurrent with the batched load): "
            f"time-to-first-byte p50 {np.percentile(ttfb, 50):.2f} s / "
            f"p95 {np.percentile(ttfb, 95):.2f} s; total p50 "
            f"{np.percentile(tot, 50):.2f} s over {len(stream_stats)} streams.",
        ]
    lines += [
        "",
        f"Health counters after the run: {json.dumps(health)} "
        "(bounded pending queue; overflow would answer 429 and increment "
        "`requests_rejected`).",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
