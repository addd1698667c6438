"""Fused ConvNeXt-block Pallas kernel vs plain-jax oracle (interpret mode on
the CPU harness; the TPU-compiled path is exercised by scripts and verified
numerically on hardware — see commit logs)."""

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops.pallas_convnext import convnext_block_fused


def _ref(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma):
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (3, 3), (0, 0)))
    acc = sum(xp[:, k : k + t, :] * dw[k][None, None, :] for k in range(7)) + dwb
    m = acc.mean(-1, keepdims=True)
    v = ((acc - m) ** 2).mean(-1, keepdims=True)
    h = (acc - m) * jax.lax.rsqrt(v + 1e-6) * lnw + lnb
    h1 = jax.nn.gelu(
        jnp.dot(h.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1,
        approximate=False,
    )
    h2 = jnp.dot(h1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + b2
    return x + gamma * h2


def test_fused_block_matches_reference(rng):
    b, t, c, inter = 2, 256, 128, 256
    mk = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = mk(b, t, c, sc=0.5)
    dw, dwb = mk(7, c), mk(c)
    lnw, lnb = jnp.ones(c), jnp.zeros(c)
    w1, b1 = mk(c, inter, sc=0.05), mk(inter, sc=0.02)
    w2, b2 = mk(inter, c, sc=0.05), mk(c, sc=0.02)
    gamma = jnp.full((c,), 0.25)

    out = convnext_block_fused(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma,
                               t_tile=128, interpret=True)
    expect = _ref(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=3e-3)
    # multi-tile boundary correctness: tile edges are interior rows
    out_1tile = convnext_block_fused(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma,
                                     t_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_1tile), atol=3e-3)
