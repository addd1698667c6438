"""Benchmark: flagship (ConvNeXt + WaveNeXt) synthesis throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md north star): >= 500x real-time per chip.

Measures the full two-stage jitted synthesise path (token-rate encode ->
host bucket pick -> frame-rate decode+vocoder) on ~10 s of audio per call,
after compile warmup. `vs_baseline` is value/500.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from optispeech_tpu.config import ExperimentConfig
    from optispeech_tpu.models.optispeech import OptiSpeech
    from optispeech_tpu.values import InferenceInputs

    compute_dtype = jnp.bfloat16
    cfg = ExperimentConfig()
    api = OptiSpeech(cfg, seed=0, compute_dtype=compute_dtype)

    # ~120 tokens; d_factor scales untrained ~1-frame durations to a natural
    # ~8 frames/token -> ~960 mel frames -> ~10.2 s of 24 kHz audio.
    rng = np.random.default_rng(0)
    n_tokens = 120
    ids = rng.integers(3, 150, n_tokens).astype(np.int64).tolist()
    inputs = InferenceInputs.from_ids_and_lengths(
        ids=[ids], lengths=[n_tokens], clean_text="bench", d_factor=8.0,
        p_factor=1.0, e_factor=1.0,
    )

    out = api.synthesise(inputs)  # compile warmup (both stages)
    audio_secs = float(out.wav_lengths.sum()) / api.sample_rate

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = api.synthesise(inputs)
    elapsed = (time.perf_counter() - t0) / n_iter
    xrt = audio_secs / elapsed

    frames = float(np.asarray(out.durations).sum())
    result = {
        "metric": "synthesis_x_realtime_per_chip",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 500.0, 4),
        "detail": {
            "audio_seconds_per_call": round(audio_secs, 3),
            "wall_seconds_per_call": round(elapsed, 5),
            "mel_frames_per_sec": round(frames / elapsed, 1),
            "am_rtf": round(out.am_rtf, 6),
            "v_rtf": round(out.v_rtf, 6),
            "compute_dtype": "bfloat16",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
