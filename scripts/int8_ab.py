"""On-chip A/B: fused ConvNeXt block — bf16 MXU vs int8 MXU (serving path).

Times an 8-block trunk (the WaveNeXt shape: dim 384, intermediate 1152,
batch 32, T 1792 — the synthesis hot spot per docs/evidence/synthesis_profile.md)
under three configs: plain-XLA bf16, fused-Pallas bf16 (production), and
fused-Pallas int8 (dynamic per-frame activation scales, per-channel weight
scales). Also reports numerics of each against the f32 XLA oracle.

Run on the TPU: `python scripts/int8_ab.py [--batch 32] [--t 1792]`.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from optispeech_tpu.ops.pallas_convnext import (  # noqa: E402
    convnext_block_fused,
    convnext_block_fused_int8,
    pick_tile,
)

C, INTER, N_BLOCKS = 384, 1152, 8


def make_params(key):
    ks = jax.random.split(key, 9)
    s = 0.02
    return dict(
        dw=jax.random.normal(ks[0], (7, C), jnp.float32) * s,
        dwb=jnp.zeros((C,), jnp.float32),
        lnw=jnp.ones((C,), jnp.float32),
        lnb=jnp.zeros((C,), jnp.float32),
        w1=jax.random.normal(ks[1], (C, INTER), jnp.float32) * s,
        b1=jnp.zeros((INTER,), jnp.float32),
        w2=jax.random.normal(ks[2], (INTER, C), jnp.float32) * s,
        b2=jnp.zeros((C,), jnp.float32),
        gamma=jnp.full((C,), 1.0 / N_BLOCKS, jnp.float32),
    )


def xla_block(x, p, dtype):
    xf = x.astype(dtype)
    pad = jnp.pad(xf, ((0, 0), (3, 3), (0, 0)))
    acc = sum(
        pad[:, k : k + x.shape[1], :] * p["dw"][k][None, None, :].astype(dtype)
        for k in range(7)
    )
    acc = (acc + p["dwb"].astype(dtype)).astype(jnp.float32)
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    h = ((acc - mean) * jax.lax.rsqrt(var + 1e-6) * p["lnw"] + p["lnb"]).astype(dtype)
    h1 = jax.nn.gelu(h @ p["w1"].astype(dtype) + p["b1"].astype(dtype), approximate=False)
    h2 = h1 @ p["w2"].astype(dtype) + p["b2"].astype(dtype)
    return (x + p["gamma"].astype(x.dtype) * h2.astype(x.dtype)).astype(x.dtype)


def trunk(block_fn, x, p):
    for _ in range(N_BLOCKS):
        x = block_fn(x, p)
    return x


def device_seconds(fn, x, p, n_iter=10):
    """Median on-device span of the jitted trunk from a profiler trace (the
    tunnel adds ~25-35 ms of host latency per call that wall time cannot
    separate from sub-ms device deltas)."""
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="int8_ab_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_iter):
            jax.block_until_ready(fn(x, p))
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
            and e.get("name", "").startswith("jit_")
        )
        return spans[len(spans) // 2] / 1e6 if spans else None
    except Exception:
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def timed(fn, x, p, n_trials=5, n_iter=10):
    out = fn(x, p)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0, :8])  # force sync-dispatch mode (tunnel trap)
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(x, p)
            jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n_iter)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=1792)
    ap.add_argument("--t-tile", type=int, default=0,
                    help="override tile length (0 = pick_tile default)")
    args = ap.parse_args()

    p = make_params(jax.random.PRNGKey(0))
    x = (jax.random.normal(jax.random.PRNGKey(1), (args.batch, args.t, C)) * 0.5)
    t_tile = args.t_tile or pick_tile(args.t)
    print(f"batch={args.batch} T={args.t} C={C} I={INTER} blocks={N_BLOCKS} t_tile={t_tile}")

    fused16 = jax.jit(lambda x, p: trunk(
        lambda x, p: convnext_block_fused(
            x, p["dw"], p["dwb"], p["lnw"], p["lnb"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["gamma"], t_tile=t_tile), x, p))
    fused8 = jax.jit(lambda x, p: trunk(
        lambda x, p: convnext_block_fused_int8(
            x, p["dw"], p["dwb"], p["lnw"], p["lnb"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["gamma"], t_tile=t_tile), x, p))
    xla16 = jax.jit(lambda x, p: trunk(lambda x, p: xla_block(x, p, jnp.bfloat16), x, p))
    oracle = jax.jit(lambda x, p: trunk(lambda x, p: xla_block(x, p, jnp.float32), x, p))

    ref = np.asarray(oracle(x, p), np.float32)
    scale = np.abs(ref).max()
    rows = []
    for name, fn, xin in [
        ("xla_bf16", xla16, x.astype(jnp.bfloat16)),
        ("fused_bf16", fused16, x.astype(jnp.bfloat16)),
        ("fused_int8", fused8, x.astype(jnp.bfloat16)),
    ]:
        t, out = timed(fn, xin, p)
        dev = device_seconds(fn, xin, p)
        o = np.asarray(out, np.float32)
        err = np.abs(o - ref).max() / scale
        corr = float(np.corrcoef(o.ravel(), ref.ravel())[0, 1])
        rows.append((name, t, dev, err, corr))
        dev_ms = f"{dev * 1e3:8.2f}" if dev else "     n/a"
        print(f"{name:12s} wall {t * 1e3:8.2f} ms/call   device {dev_ms} ms"
              f"   rel-err {err:.4g}   corr {corr:.6f}")

    base = rows[1][2] or rows[1][1]
    mine = rows[2][2] or rows[2][1]
    print(f"int8 speedup vs fused_bf16 (device): {base / mine:.3f}x")


if __name__ == "__main__":
    main()
