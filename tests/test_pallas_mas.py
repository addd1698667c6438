"""Pallas MAS kernel vs the production lax.scan implementation."""

import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops.mas import viterbi_decode
from optispeech_tpu.ops.pallas_mas import viterbi_decode_pallas


def test_pallas_mas_matches_scan(rng):
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
