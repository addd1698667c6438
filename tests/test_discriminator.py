"""Discriminator bundle tests: shapes, loss semantics vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from optispeech_tpu.config import DiscriminatorConfig, FeatureConfig
from optispeech_tpu.models.discriminator.losses import (
    discriminator_adv_loss,
    generator_adv_loss,
    mel_spec_reconstruction_loss,
    multi_resolution_stft_loss,
)
from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator

SEG = 16 * 256  # 16-frame segment at hop 256 (training-size waveform)


def test_hinge_losses_match_reference_semantics(rng):
    scores = [jnp.asarray(rng.normal(size=(2, 30)).astype(np.float32)) for _ in range(3)]
    fakes = [jnp.asarray(rng.normal(size=(2, 30)).astype(np.float32)) for _ in range(3)]
    g_loss, g_list = generator_adv_loss(fakes)
    expect = sum(torch.mean(torch.clamp(1 - torch.tensor(np.asarray(f)), min=0)) for f in fakes)
    np.testing.assert_allclose(float(g_loss), float(expect), rtol=1e-6)
    d_loss, r_l, g_l = discriminator_adv_loss(scores, fakes)
    expect_d = sum(
        torch.mean(torch.clamp(1 - torch.tensor(np.asarray(r)), min=0))
        + torch.mean(torch.clamp(1 + torch.tensor(np.asarray(f)), min=0))
        for r, f in zip(scores, fakes)
    )
    np.testing.assert_allclose(float(d_loss), float(expect_d), rtol=1e-6)


def test_mr_stft_loss_vs_torch(rng):
    x = rng.normal(size=(2, SEG)).astype(np.float32) * 0.3
    y = rng.normal(size=(2, SEG)).astype(np.float32) * 0.3
    sc, mag = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y))

    def torch_stft_mag(t, fs, ss, wl):
        s = torch.stft(torch.tensor(t), fs, ss, wl, torch.hann_window(wl), return_complex=False)
        real, imag = s[..., 0], s[..., 1]
        return torch.sqrt(torch.clamp(real**2 + imag**2, min=1e-7)).transpose(2, 1)

    sc_e, mag_e = 0.0, 0.0
    for fs, ss, wl in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        xm = torch_stft_mag(x, fs, ss, wl)
        ym = torch_stft_mag(y, fs, ss, wl)
        sc_e += float(torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro"))
        mag_e += float(torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)))
    np.testing.assert_allclose(float(sc), sc_e / 3, rtol=2e-3)
    np.testing.assert_allclose(float(mag), mag_e / 3, rtol=2e-3, atol=1e-3)


def test_mel_loss_positive_and_zero_on_identical(rng):
    x = rng.normal(size=(1, SEG)).astype(np.float32) * 0.2
    loss_same = mel_spec_reconstruction_loss(
        jnp.asarray(x), jnp.asarray(x), 24000, 1024, 256, 1024, 100, 80, 8000
    )
    assert float(loss_same) == 0.0
    y = rng.normal(size=(1, SEG)).astype(np.float32) * 0.2
    loss_diff = mel_spec_reconstruction_loss(
        jnp.asarray(x), jnp.asarray(y), 24000, 1024, 256, 1024, 100, 80, 8000
    )
    assert float(loss_diff) > 0.0


def test_vocos_discriminator_end_to_end(rng):
    cfg = DiscriminatorConfig()
    feats = FeatureConfig()
    disc = VocosDiscriminator(cfg, feats)
    wav = jnp.asarray(rng.normal(size=(2, SEG)).astype(np.float32) * 0.3)
    wav_hat = jnp.asarray(rng.normal(size=(2, SEG)).astype(np.float32) * 0.3)
    variables = disc.init(jax.random.PRNGKey(0), wav, wav_hat)

    d_loss, d_log = disc.apply(variables, wav, wav_hat, method=VocosDiscriminator.forward_disc)
    g_loss, g_log = disc.apply(variables, wav, wav_hat, method=VocosDiscriminator.forward_gen)
    v_loss, v_log = disc.apply(variables, wav, wav_hat, method=VocosDiscriminator.forward_val)
    for name, val in [("disc", d_loss), ("gen", g_loss), ("val", v_loss)]:
        assert np.isfinite(float(val)), name
    assert set(d_log) == {"loss_mp", "loss_mrd"}
    assert {"mel_loss", "mr_stft_loss"} <= set(g_log)

    # D grads exist and are finite
    def loss_fn(params):
        loss, _ = disc.apply({"params": params}, wav, wav_hat, method=VocosDiscriminator.forward_disc)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_weight_norm_init_matches_torch_convention(rng):
    """torch weight_norm inits g = ||v|| so the effective kernel at init is
    the raw kaiming kernel; flax defaults g to ones (unit-norm channels).
    init_train_state applies the torch convention to fresh discriminators."""
    import jax

    from optispeech_tpu.models.discriminator.critics import torch_weight_norm_init

    disc = VocosDiscriminator(
        DiscriminatorConfig(periods=(2,), resolutions=((256, 64, 256),), mrd_channels=8),
        FeatureConfig(),
    )
    raw = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4096)), jnp.zeros((1, 4096)),
                    method=type(disc).forward_disc)["params"]
    fixed = torch_weight_norm_init(raw)

    def leaves_with_path(d, path=()):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from leaves_with_path(v, path + (k,))
            else:
                yield path + (k,), v

    def get(d, path):
        for k in path:
            d = d[k]
        return d

    checked = 0
    for path, raw_scale in leaves_with_path(raw):
        if not path[-1].endswith("/kernel/scale"):
            continue
        # scale param "<Layer>/kernel/scale" under (..., wn_name); raw v at
        # (..., Layer, kernel) in the same scope
        layer = path[-1][: -len("/kernel/scale")]
        kernel_path = path[:-2] + (layer, "kernel")
        v = np.asarray(get(raw, kernel_path))
        want = np.sqrt((v ** 2).sum(axis=tuple(range(v.ndim - 1))))
        np.testing.assert_allclose(np.asarray(get(fixed, path)), want, rtol=1e-5)
        assert (np.asarray(raw_scale) == 1.0).all()  # flax default before fix
        checked += 1
    assert checked >= 10  # every weight-normed conv in MPD p2 + MRD r0
