"""Pallas MAS kernel vs the production lax.scan implementation."""

import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops.mas import viterbi_decode
from optispeech_tpu.ops.pallas_mas import viterbi_decode_pallas


def test_pallas_mas_matches_scan(rng):
    """Interpret mode on the CPU harness; the same kernel compiles via Mosaic
    on the chip (8-frame sublane tiling) and matched the scan bit-exactly at
    B=16, F=768, T=128 — device 2.98 ms vs the scan's 2.58 ms, so the scan
    stays the production/training path (it also carries the bin-loss grad)."""
    b, t_feats, t_text = 3, 40, 10
    text_lengths = np.array([10, 6, 8])
    feats_lengths = np.array([40, 22, 31])
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32) + 1e-8)

    ds_ref, bl_ref = viterbi_decode(
        jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths)
    )
    ds_pal, bl_pal = viterbi_decode_pallas(
        jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ds_pal), np.asarray(ds_ref))
    np.testing.assert_allclose(float(bl_pal), float(bl_ref), rtol=1e-5)


def test_pallas_mas_pads_nonmultiple_of_8_frames(rng):
    """T_feats not divisible by the 8-row sublane tile: the kernel pads and
    masks, results unchanged."""
    b, t_feats, t_text = 2, 43, 12
    text_lengths = np.array([12, 7])
    feats_lengths = np.array([43, 29])
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32) + 1e-8)

    ds_ref, bl_ref = viterbi_decode(
        jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths)
    )
    ds_pal, bl_pal = viterbi_decode_pallas(
        jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ds_pal), np.asarray(ds_ref))
    np.testing.assert_allclose(float(bl_pal), float(bl_ref), rtol=1e-5)
