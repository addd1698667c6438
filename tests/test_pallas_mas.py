"""Pallas MAS kernels vs the production lax.scan implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops.mas import viterbi_decode
from optispeech_tpu.ops.pallas_mas import viterbi_decode_pallas
from optispeech_tpu.ops.pallas_mas_wavefront import viterbi_decode_wavefront


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


def test_wavefront_mas_matches_scan_and_carries_gradient(rng):
    """Round-3 batch-on-lanes kernel (ops/pallas_mas_wavefront.py):
    durations bit-exact vs the scan, bin loss equal, and — unlike the
    round-2 kernel — the bin-loss gradient matches because the path gather
    happens outside the kernel against the live tensor."""
    b, t_feats, t_text = 4, 40, 24
    text_lengths = jnp.asarray([24, 7, 13, 1])
    feats_lengths = jnp.asarray([40, 17, 25, 3])
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)) + 1e-8),
        jnp.float32,
    )
    ds_ref, bl_ref = viterbi_decode(lp, text_lengths, feats_lengths)
    ds_wf, bl_wf = viterbi_decode_wavefront(lp, text_lengths, feats_lengths,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(ds_wf), np.asarray(ds_ref))
    np.testing.assert_allclose(float(bl_wf), float(bl_ref), rtol=1e-5)

    g_ref = jax.grad(lambda x: viterbi_decode(x, text_lengths, feats_lengths)[1])(lp)
    g_wf = jax.grad(lambda x: viterbi_decode_wavefront(
        x, text_lengths, feats_lengths, interpret=True)[1])(lp)
    np.testing.assert_allclose(np.asarray(g_wf), np.asarray(g_ref), atol=1e-6)


def test_wavefront_mas_odd_shapes(rng):
    """Non-multiple-of-chunk frames and non-multiple-of-32 tokens pad
    internally; results unchanged."""
    b, t_feats, t_text = 2, 43, 23
    text_lengths = jnp.asarray([23, 9])
    feats_lengths = jnp.asarray([43, 29])
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)) + 1e-8),
        jnp.float32,
    )
    ds_ref, bl_ref = viterbi_decode(lp, text_lengths, feats_lengths)
    ds_wf, bl_wf = viterbi_decode_wavefront(lp, text_lengths, feats_lengths,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(ds_wf), np.asarray(ds_ref))
    np.testing.assert_allclose(float(bl_wf), float(bl_ref), rtol=1e-5)


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
