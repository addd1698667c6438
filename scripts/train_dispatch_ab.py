"""A/B: per-step dispatch vs K-step lax.scan dispatch for cached training.

Measures, on the real chip against a packed corpus (default: the round-4
campaign's), steps/s at batch 128 for:

  A. one dispatch per GAN step (trainer production path; per-batch bucketed
     (t_text, t_mel) shapes),
  B. one dispatch per K steps via make_cached_scan_step, shapes padded to
     the ARENA max (the price of static shapes across the chunk).

Context: at batch 128 the compiled step is ~185 ms but the tunneled harness
adds ~130 ms fixed overhead per dispatch (the RPC serializes the state handle
tree), capping the trainer at ~3.15 steps/s vs 5.4 compiled. Scan-K divides
that overhead by K; this script quantifies whether the global-max padding
gives the win back.

Usage:
    python scripts/train_dispatch_ab.py [--pak runs/campaign_r4/train.pak] \
        [--steps 60] [--scan-k 10] [--batch-size 128] [--out report.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pak", default=str(REPO / "runs/campaign_r4/train.pak"))
    p.add_argument("--stats", default=str(REPO / "runs/campaign_r4/stats.json"))
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--scan-k", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    from optispeech_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from optispeech_tpu.data.device_cache import DeviceCacheLoader, DeviceFeatureCache
    from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
    from optispeech_tpu.models.generator import OptiSpeechGenerator
    from optispeech_tpu.ops.segments import host_sample_segment_starts
    from optispeech_tpu.training.state import init_train_state
    from optispeech_tpu.training.step import make_cached_scan_step, make_cached_train_step
    from optispeech_tpu.utils.yamlcfg import load_experiment

    raw = json.loads(Path(args.stats).read_text())
    cfg = load_experiment(
        "campaign-ms", overrides=[f"data.statistics.{k}={v}" for k, v in raw.items()]
    )
    stats = cfg.data.statistics

    cache = DeviceFeatureCache(
        args.pak, stats, f_min=cfg.generator.features.f_min,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.max_text_len, max_mel_len=cfg.data.max_mel_len,
    )
    loader = DeviceCacheLoader(
        cache, args.batch_size, cfg.data.text_bucket_size, cfg.data.mel_bucket_size,
        shuffle=True, seed=0, max_text_len=cfg.data.max_text_len,
        max_mel_len=cfg.data.max_mel_len,
    )
    import jax.numpy as jnp

    gen = OptiSpeechGenerator(cfg.generator)
    disc = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, gen, disc, jax.random.PRNGKey(0))
    # measure the FULL GAN step: advance past the pretraining gate so the
    # lax.cond takes the G+D branch (step < pretraining_steps is the cheaper
    # generator-only phase and reads ~4x faster)
    state = state.replace(step=jnp.asarray(
        cfg.train_args.pretraining_steps * 2, jnp.int32))

    def light_batches(n):
        out = []
        while len(out) < n:
            for b in loader:
                rng = np.random.default_rng(len(out))
                seg = min(cfg.generator.segment_size, b["t_mel"])
                start = host_sample_segment_starts(rng, b["mel_lengths"], seg)
                out.append((np.stack([b["idx"], start.astype(np.int32)], axis=1),
                            b["t_text"], b["t_mel"]))
                if len(out) >= n:
                    break
        return out

    batches = light_batches(args.steps + 8)
    report = {"batch_size": args.batch_size, "steps": args.steps,
              "scan_k": args.scan_k,
              "arena_shape": [cache.t_text_max, cache.t_mel_max]}

    # --- A: per-step dispatch, per-batch bucket shapes -------------------
    step_fn = make_cached_train_step(cfg, gen, disc, cache, donate=False)
    # warm every distinct shape
    shapes = {(t, m) for _, t, m in batches}
    for t, m in shapes:
        b = next(x for x in batches if (x[1], x[2]) == (t, m))
        s2, logs = step_fn(state, b[0], t_text=t, t_mel=m)
    jax.device_get(logs["total_loss/generator"])  # sync-mode trigger
    t0 = time.perf_counter()
    s = state
    for bi, (ks, t, m) in enumerate(batches[: args.steps]):
        s, logs = step_fn(s, ks, t_text=t, t_mel=m)
    jax.device_get(logs["total_loss/generator"])
    a_sps = args.steps / (time.perf_counter() - t0)
    report["per_step_dispatch_steps_per_sec"] = round(a_sps, 3)
    report["shapes_seen"] = sorted(shapes)

    # --- A2: per-step dispatch WITH buffer donation (the trainer default) —
    # donation may serialize dispatches through the tunnel (each call must
    # retire the previous state's buffers before reusing them)
    step_don = make_cached_train_step(cfg, gen, disc, cache, donate=True)
    import jax as _jax

    s = _jax.tree_util.tree_map(lambda x: x + 0, state)  # fresh, donatable copy
    s, logs = step_don(s, batches[0][0], t_text=batches[0][1], t_mel=batches[0][2])
    jax.device_get(logs["total_loss/generator"])
    t0 = time.perf_counter()
    for ks, t, m in batches[1 : args.steps + 1]:
        s, logs = step_don(s, ks, t_text=t, t_mel=m)
    jax.device_get(logs["total_loss/generator"])
    report["per_step_donated_steps_per_sec"] = round(
        args.steps / (time.perf_counter() - t0), 3)

    # --- B: scan-K dispatch, arena-max shapes ----------------------------
    scan_fn = make_cached_scan_step(cfg, gen, disc, cache, donate=False)
    tmax, mmax = cache.t_text_max, cache.t_mel_max
    k = args.scan_k
    chunks = [np.stack([b[0] for b in batches[i : i + k]])
              for i in range(0, args.steps, k) if i + k <= args.steps + 8]
    s2, logs_k = scan_fn(state, chunks[0], t_text=tmax, t_mel=mmax)  # warm
    jax.device_get(logs_k["total_loss/generator"])
    n = (args.steps // k) * k
    t0 = time.perf_counter()
    s = state
    for c in chunks[: args.steps // k]:
        s, logs_k = scan_fn(s, c, t_text=tmax, t_mel=mmax)
    jax.device_get(logs_k["total_loss/generator"])
    b_sps = n / (time.perf_counter() - t0)
    report["scan_k_dispatch_steps_per_sec"] = round(b_sps, 3)
    report["scan_speedup"] = round(b_sps / a_sps, 3)

    print(json.dumps(report, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
