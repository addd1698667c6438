"""Benchmark: flagship (ConvNeXt + WaveNeXt) synthesis throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md north star): >= 500x real-time per chip.

Measures the single-graph `synthesise_on_device` serving path: full
text -> waveform jit with a static frame cap, zero host syncs; each timed call
is synced with `block_until_ready` so the number is true device time. This
matches the reference's RTF timer semantics (its timers stop before
`.detach().cpu()`, generator/__init__.py:285-292). Device->host transfer of
the audio is reported separately in `detail` — on this harness the TPU is
behind a network tunnel with ~50 ms / ~25 MB/s D2H, which is a property of
the tunnel, not the chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: first compile through the TPU tunnel is minutes
from optispeech_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _profiled_device_seconds_per_call(api, inputs, n_frames, n_iter=10):
    """Median on-device execution span of the jitted synthesis module, from a
    jax.profiler trace (the chrome-trace device track)."""
    import glob
    import gzip
    import shutil
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_iter):
            out = api.synthesise_on_device(inputs, n_frames)
            jax.block_until_ready(out)
        jax.profiler.stop_trace()
        paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
        if not paths:
            return None
        with gzip.open(paths[0]) as f:
            events = json.load(f)["traceEvents"]
        device_pids = {
            e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")
        }
        spans = sorted(
            e["dur"] for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids
            and e.get("name", "").startswith("jit__fixed_fn")
        )
        if not spans:
            return None
        return spans[len(spans) // 2] / 1e6
    except Exception:
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def main():
    import dataclasses

    from optispeech_tpu.config import ExperimentConfig
    from optispeech_tpu.models.optispeech import OptiSpeech
    from optispeech_tpu.values import InferenceInputs

    cfg = ExperimentConfig()
    api_xla = OptiSpeech(cfg, seed=0, compute_dtype=jnp.bfloat16)
    # production path: fused Pallas ConvNeXt blocks in the decoder and the
    # vocoder trunk (the (T, intermediate) MLP activation stays in VMEM) —
    # measured ~1.2x device-time win over XLA at batch 32 and closer to the
    # f32 oracle than the bf16 XLA path
    g = cfg.generator
    cfg_fused = dataclasses.replace(cfg, generator=dataclasses.replace(
        g,
        decoder=dataclasses.replace(g.decoder, fused_pallas=True),
        vocoder=dataclasses.replace(g.vocoder, fused_pallas=True),
    ))
    api = OptiSpeech(cfg_fused, params=api_xla.params, compute_dtype=jnp.bfloat16)

    # ~120 tokens; d_factor scales untrained ~1-frame durations to a natural
    # ~13 frames/token -> ~1600 mel frames -> ~17 s of 24 kHz audio per item.
    rng = np.random.default_rng(0)
    n_tokens = 120
    batch = 32  # serving batch; per-chip throughput = batch * audio / wall.
    # Per-call wall = ~35-40 ms fixed tunnel sync latency + ~0.65 ms/item real
    # compute (batch-scaling measured 8->64); larger batches amortize the sync.
    ids = [rng.integers(3, 150, n_tokens).astype(np.int64).tolist() for _ in range(batch)]
    inputs = InferenceInputs.from_ids_and_lengths(
        ids=ids, lengths=[n_tokens] * batch, clean_text="bench", d_factor=8.0,
        p_factor=1.0, e_factor=1.0,
    )
    n_frames = 1792

    out = api.synthesise_on_device(inputs, n_frames)  # compile warmup
    jax.block_until_ready(out)

    # Force the tunnel into synchronous-dispatch mode BEFORE timing: until the
    # first device->host transfer, block_until_ready through this tunnel only
    # acknowledges the enqueue (timings come out batch-size-invariant and
    # exceed peak FLOP/s — dishonest). One D2H flips the process into real
    # per-call synchronization; only then are the timings trustworthy.
    audio_secs = float(np.asarray(out["wav_lengths"]).sum()) / api.sample_rate

    def timed(a, n_trials=7, n_iter=20):
        ts = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                o = a.synthesise_on_device(inputs, n_frames)
                jax.block_until_ready(o)
            ts.append((time.perf_counter() - t0) / n_iter)
        ts.sort()
        return ts[len(ts) // 2], ts[0], o

    wall_time, best_wall, out = timed(api)
    # A/B: plain-XLA decoder+vocoder (same params) for the published delta
    o_xla = api_xla.synthesise_on_device(inputs, n_frames)
    jax.block_until_ready(o_xla)
    xla_wall, _, _ = timed(api_xla, n_trials=3)

    # True per-chip compute time from the on-device profiler. Every sync-mode
    # dispatch through this harness's network tunnel carries ~35 ms of fixed
    # host<->TPU round-trip latency that a co-located production host does not
    # pay; the device-track span of the jitted module is what the chip itself
    # spends per call. Wall-clock numbers (incl. tunnel) stay in `detail`.
    device_time = _profiled_device_seconds_per_call(api, inputs, n_frames)
    if device_time is None:
        device_time = wall_time  # profiler unavailable: fall back, stay honest
    xrt = audio_secs / device_time

    # D2H cost (tunnel): fetch the full waveform batch once in each serving
    # wire format computed on device — µ-law (8-bit, quarter of f32) is the
    # headline wire; pcm16 and f32 stay for comparison
    out8 = api.synthesise_on_device(inputs, n_frames, mulaw=True)
    jax.block_until_ready(out8)
    wl = np.asarray(out8["wav_lengths"]).astype(int)
    # packed fetch: valid samples only (ops/mulaw.pack_valid_rows); warm the
    # slice graph first so the timing is the transfer, not a compile
    api.fetch_packed(out8["wav_mulaw_packed"], int(wl.sum()))
    t0 = time.perf_counter()
    packed_host = api.fetch_packed(out8["wav_mulaw_packed"], int(wl.sum()))
    d2h_mulaw_time = time.perf_counter() - t0
    assert packed_host.dtype == np.uint8 and len(packed_host) == int(wl.sum())
    offs = np.concatenate([[0], np.cumsum(wl)[:-1]])
    t0 = time.perf_counter()
    mulaw_host_padded = np.asarray(out8["wav_mulaw"])
    d2h_mulaw_padded_time = time.perf_counter() - t0
    # packed rows must equal the padded rows' valid prefixes
    np.testing.assert_array_equal(packed_host[offs[0]:offs[0] + wl[0]],
                                  mulaw_host_padded[0, :wl[0]])
    mulaw_host = mulaw_host_padded
    out16 = api.synthesise_on_device(inputs, n_frames, pcm16=True)
    jax.block_until_ready(out16)
    t0 = time.perf_counter()
    wav_host = np.asarray(out16["wav_pcm16"])
    d2h_time = time.perf_counter() - t0
    assert wav_host.dtype == np.int16
    t0 = time.perf_counter()
    wav_f32_host = np.asarray(out["wav"])
    d2h_f32_time = time.perf_counter() - t0
    assert np.isfinite(wav_f32_host).all()
    # wire fidelity: µ-law round-trip SNR vs the f32 waveform (sanity floor)
    from optispeech_tpu.ops.mulaw import mulaw_decode

    dec = mulaw_decode(mulaw_host)
    err = dec - np.clip(wav_f32_host, -1, 1)
    sig_pow = float((np.clip(wav_f32_host, -1, 1) ** 2).mean())
    mulaw_snr_db = 10.0 * np.log10(sig_pow / max(float((err ** 2).mean()), 1e-12))

    frames = float(np.asarray(out["y_lengths"]).sum())
    result = {
        "metric": "synthesis_x_realtime_per_chip",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 500.0, 4),
        "detail": {
            "batch": batch,
            "audio_seconds_per_call": round(audio_secs, 3),
            "device_seconds_per_call": round(device_time, 6),
            "mel_frames_per_sec": round(frames / device_time, 1),
            "wall_seconds_per_call_incl_tunnel_sync": round(wall_time, 6),
            "best_wall_seconds_per_call": round(best_wall, 6),
            "x_realtime_wall_incl_tunnel": round(audio_secs / wall_time, 2),
            "d2h_seconds_tunnel_mulaw_packed": round(d2h_mulaw_time, 4),
            "d2h_seconds_tunnel_mulaw_padded": round(d2h_mulaw_padded_time, 4),
            "d2h_seconds_tunnel_pcm16": round(d2h_time, 4),
            "d2h_seconds_tunnel_f32": round(d2h_f32_time, 4),
            "valid_fraction_of_padded_buffer": round(float(wl.sum()) / mulaw_host.size, 4),
            "mulaw_round_trip_snr_db": round(float(mulaw_snr_db), 2),
            # headline tunnel-inclusive number rides the µ-law serving wire,
            # device-encoded AND valid-length packed (only real samples cross
            # the link); pcm16 kept for round-over-round compare
            "x_realtime_incl_tunnel_d2h": round(audio_secs / (wall_time + d2h_mulaw_time), 2),
            "x_realtime_incl_tunnel_d2h_pcm16": round(audio_secs / (wall_time + d2h_time), 2),
            "compute_dtype": "bfloat16",
            "decoder_vocoder_blocks": "pallas_fused",
            "xla_wall_seconds_per_call": round(xla_wall, 6),
            "pallas_wall_speedup_vs_xla": round(xla_wall / wall_time, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
