"""On-chip A/B: production MAS scan vs the batch-on-lanes Pallas kernel.

Decides whether `ops/pallas_mas_wavefront.viterbi_decode_wavefront` replaces
`ops/mas.viterbi_decode` in the production training path (VERDICT r2 item 9).
Shapes mirror the round-2 A/B table in docs/evidence/training_profile.md
(T_text=384, T_mel=768, batch 16/128) so the numbers are comparable.

Usage: python scripts/mas_ab.py  (runs on the default jax backend — the TPU)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from optispeech_tpu.ops.mas import viterbi_decode
from optispeech_tpu.ops.pallas_mas_wavefront import viterbi_decode_wavefront


def bench(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # tunnel trap (CLAUDE.md): one D2H before timing so block_until_ready
    # acks completion, not just the enqueue
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3), out


def main():
    t_text, t_mel = 384, 768
    rows = []
    for b in (16, 128):
        rng = np.random.default_rng(0)
        lp = jnp.asarray(rng.standard_normal((b, t_mel, t_text)), jnp.float32)
        tl = jnp.asarray(rng.integers(t_text // 2, t_text, b), jnp.int32)
        fl = jnp.asarray(rng.integers(t_mel // 2, t_mel, b), jnp.int32)
        scan_jit = jax.jit(viterbi_decode)
        ms_scan, out_s = bench(scan_jit, (lp, tl, fl))
        ms_wf, out_w = bench(viterbi_decode_wavefront, (lp, tl, fl))
        exact = bool(jnp.all(out_s[0] == out_w[0]))
        rows.append({"batch": b, "scan_ms": round(ms_scan, 2),
                     "wavefront_ms": round(ms_wf, 2), "durations_exact": exact})
        print(json.dumps(rows[-1]), flush=True)
    winner = "wavefront" if all(r["wavefront_ms"] < r["scan_ms"] for r in rows) \
        else "scan"
    print(json.dumps({"production_choice": winner, "rows": rows}))


if __name__ == "__main__":
    main()
