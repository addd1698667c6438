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


def test_fused_int8_block_matches_oracle(rng):
    """Int8 kernel == the pure-jnp oracle of the same quantized math
    (bit-equal quantizers), and stays close to the unquantized block."""
    from optispeech_tpu.ops.pallas_convnext import (
        convnext_block_fused_int8,
        convnext_block_int8_oracle,
    )

    b, t, c, inter = 2, 256, 128, 256
    mk = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = mk(b, t, c, sc=0.5)
    dw, dwb = mk(7, c), mk(c)
    lnw, lnb = jnp.ones(c), jnp.zeros(c)
    w1, b1 = mk(c, inter, sc=0.05), mk(inter, sc=0.02)
    w2, b2 = mk(inter, c, sc=0.05), mk(c, sc=0.02)
    gamma = jnp.full((c,), 0.25)
    args = (x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma)

    out = convnext_block_fused_int8(*args, t_tile=128, interpret=True)
    oracle = convnext_block_int8_oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               atol=1e-5, rtol=1e-5)
    # quantization error vs the f32 block stays small (dynamic per-row scales)
    f32 = _ref(*args)
    err = np.abs(np.asarray(out) - np.asarray(f32)).max() / np.abs(np.asarray(f32)).max()
    assert err < 0.02, err


def test_pick_tile():
    from optispeech_tpu.ops.pallas_convnext import pick_tile

    assert pick_tile(1792) == 896  # measured best for the trunk (int8_ab.py)
    assert pick_tile(1024) == 512
    assert pick_tile(128) == 128
    assert pick_tile(40) is None  # no legal tiling -> caller falls back
    # VMEM bound: fat channels force a shorter tile instead of a Mosaic OOM,
    # and channels whose weights alone exceed VMEM fall back to XLA entirely
    assert pick_tile(1792, c=512, inter=2048) == 448
    assert pick_tile(1792, c=1024, inter=4096) is None


def test_backbone_fused_flag_matches_standard_path(rng, monkeypatch):
    """The production wiring (ConvNeXtBackbone(..., fused=True) reading flax
    params into the kernel) must reproduce the standard path. The kernel is
    forced into interpret mode for the CPU harness; on the TPU chip the same
    wiring compiles via Mosaic (A/B'd in bench.py detail)."""
    import optispeech_tpu.ops.pallas_convnext as pc
    from optispeech_tpu.models.modules.convnext import ConvNeXtBackbone

    orig = pc.convnext_block_fused
    calls = []

    def interp(*args, **kw):
        calls.append(1)
        return orig(*args, interpret=True, **kw)

    monkeypatch.setattr(pc, "convnext_block_fused", interp)
    monkeypatch.setattr(pc, "fused_supported", lambda: True)  # CPU harness

    model = ConvNeXtBackbone(dim=64, intermediate_dim=128, num_layers=2)
    x = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    base = model.apply(variables, x)
    fused = model.apply(variables, x, fused=True)
    assert len(calls) == 2  # both blocks routed through the kernel
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=3e-3)

    # padding mask interacts correctly with the fused blocks
    pad = jnp.zeros((2, 128), bool).at[:, 100:].set(True)
    base_m = model.apply(variables, x, pad)
    fused_m = model.apply(variables, x, pad, fused=True)
    np.testing.assert_allclose(np.asarray(fused_m), np.asarray(base_m), atol=3e-3)
