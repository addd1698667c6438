"""Shape/mask invariance per backbone (SURVEY.md §4 test plan): growing the
padded length must not change valid-region outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optispeech_tpu.models.generator import make_backbone

from test_generator import tiny_cfg


@pytest.mark.parametrize("kind", ["convnext", "transformer", "leanspeech"])
# lightspeech is intentionally absent: the reference EncSepConvLayer masks only
# before conv1, so conv2 reads conv1 spill past the valid edge and outputs
# legitimately depend on pad width (faithful behaviour, k=25 > margin).
# conformer is likewise absent: the reference applies the conv module (k=7)
# unmasked (_conformer/encoder_layer.py:148-153), so tensor-edge zero padding
# leaks inward ~3 positions per block — faithful behaviour, verified instead by
# test_reference_parity.py against the actual reference code.
def test_padding_invariance(rng, kind):
    cfg = tiny_cfg(kind, kind).encoder
    dim = 32
    bb = make_backbone(cfg, dim, jnp.float32, "bb")
    t_valid = 11
    x_short = jnp.asarray(rng.normal(size=(2, 16, dim)).astype(np.float32))
    x_long = jnp.concatenate([x_short, jnp.zeros((2, 16, dim))], axis=1)
    pad_short = jnp.arange(16)[None, :].repeat(2, 0) >= t_valid
    pad_long = jnp.arange(32)[None, :].repeat(2, 0) >= t_valid

    variables = bb.init(jax.random.PRNGKey(0), x_short, pad_short, deterministic=True)
    out_short = bb.apply(variables, x_short, pad_short, deterministic=True)
    out_long = bb.apply(variables, x_long, pad_long, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_short)[:, :t_valid], np.asarray(out_long)[:, :t_valid],
        rtol=1e-4, atol=1e-5,
    )
