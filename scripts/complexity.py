"""Analytic FLOPs/params accounting per model variant.

Role of /root/reference/scripts/computational_complexity.py (calflops table in
README.md:164-171), computed TPU-natively from XLA's own cost analysis of the
compiled inference graphs.

Usage: JAX_PLATFORMS=cpu python scripts/complexity.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def main():
    from optispeech_tpu.models.generator import OptiSpeechGenerator
    from optispeech_tpu.models.optispeech import OptiSpeech
    from optispeech_tpu.utils.yamlcfg import load_experiment

    n_tokens, n_frames = 96, 768  # ~8 s of speech
    rows = []
    for variant in ("default", "light", "transformer", "conformer"):
        cfg = load_experiment(variant)
        api = OptiSpeech(cfg, seed=0)

        def fn(params, x, xl):
            enc = api.generator.apply(
                {"params": params}, x, xl, None, None,
                jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
                method=OptiSpeechGenerator.encode,
            )
            return api.generator.apply(
                {"params": params}, enc["hidden"], enc["durations"], enc["x_mask"],
                jnp.minimum(enc["y_lengths"], n_frames), n_frames,
                method=OptiSpeechGenerator.decode,
            )["wav"]

        x = jnp.zeros((1, n_tokens), jnp.int32)
        xl = jnp.full((1,), n_tokens, jnp.int32)
        compiled = jax.jit(fn).lower(api.params, x, xl).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = cost.get("flops", float("nan"))
        rows.append((variant, flops / 1e9, count_params(api.params) / 1e6))

    print(f"{'variant':<12} {'GFLOPs':>10} {'params (M)':>12}   (inference, "
          f"{n_tokens} tokens -> {n_frames} frames)")
    for name, gf, p in rows:
        print(f"{name:<12} {gf:>10.2f} {p:>12.2f}")


if __name__ == "__main__":
    main()
