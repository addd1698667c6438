"""Minimal client for the batching HTTP server (cli/serve.py).

Demonstrates every response format, including decoding the 8-bit µ-law wire
(quarter of the f32 bytes — the cheapest way to pull audio off a remote TPU
host) and consuming /stream chunks as they arrive.

    python -m optispeech_tpu.cli.serve CKPT_OR_ARTIFACT --port 8000 &
    python examples/serve_client.py http://127.0.0.1:8000 "Hello world."
"""

import json
import sys
import urllib.request

import numpy as np


def post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=600)


def main():
    base, text = sys.argv[1], sys.argv[2]

    # 1. WAV (default): ready-to-play bytes
    with post(base, "/synthesise", {"text": text}) as r:
        open("out.wav", "wb").write(r.read())
    print("out.wav written")

    # 2. µ-law: 8-bit codes, decode client-side
    with post(base, "/synthesise", {"text": text, "format": "mulaw"}) as r:
        sr = int(r.headers["X-Sample-Rate"])
        codes = np.frombuffer(r.read(), np.uint8)
    mu = 255.0
    y = codes.astype(np.float32) / 255.0 * 2.0 - 1.0
    wav = np.sign(y) * ((1.0 + mu) ** np.abs(y) - 1.0) / mu  # ops.mulaw.mulaw_decode
    print(f"µ-law: {len(codes)} bytes -> {len(wav) / sr:.2f}s of audio")

    # 3. streaming: audio chunks arrive while later frames still decode
    with post(base, "/stream", {"text": text}) as r:
        total = 0
        while True:
            chunk = r.read(8192)
            if not chunk:
                break
            total += len(chunk)
            # feed your audio device here; int16 little-endian PCM
    print(f"/stream delivered {total // 2} samples")


if __name__ == "__main__":
    main()
