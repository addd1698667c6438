"""End-to-end numerical parity against the ACTUAL reference implementation.

Loads the real torch modules from /root/reference (via reference_loader),
builds a randomly-initialized reference OptiSpeechGenerator, converts its
state_dict with compat.torch_import, and asserts end-to-end `synthesise`
agreement: identical integer durations, waveform allclose, and the BASELINE
mel-L1 <= 1e-2 gate (reference generator/__init__.py:194-296).

Covered: ConvNeXt (flagship), LightSpeech with separable "lite" predictors
(configs/model/light.yaml), ESPnet Transformer, Conformer, LeanSpeech,
multi-speaker/multi-language — every backbone has a torch-parity path.
"""

from functools import partial
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import load_reference

from optispeech_tpu.compat.torch_import import convert_torch_generator_state_dict
from optispeech_tpu.config import (
    BackboneConfig,
    FeatureConfig,
    GeneratorConfig,
    VariancePredictorConfig,
    VocoderConfig,
)
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.ops import log_mel_spectrogram

FEATS = dict(sample_rate=24000, n_feats=20, n_fft=256, hop_length=64, win_length=256)
DIM = 32


def _backbones(kind, M):
    """(torch encoder partial, torch decoder partial, our enc cfg, our dec cfg)."""
    if kind == "convnext":
        t = partial(M.ConvNeXtBackbone, intermediate_dim=64, num_layers=2, drop_path=0.2)
        c = BackboneConfig(kind="convnext", intermediate_dim=64, num_layers=2, drop_path=0.2)
        return t, t, c, c
    if kind == "lightspeech":
        te = partial(M.LightSpeechTransformerEncoder, kernel_sizes=[5, 13],
                     activation="relu", dropout=0.2)
        td = partial(M.LightSpeechTransformerDecoder, kernel_sizes=[17, 9],
                     activation="relu", dropout=0.2, max_source_positions=2000)
        ce = BackboneConfig(kind="lightspeech", kernel_sizes=(5, 13), activation="relu", dropout=0.2)
        cd = BackboneConfig(kind="lightspeech", kernel_sizes=(17, 9), activation="relu", dropout=0.2)
        return te, td, ce, cd
    if kind == "transformer":
        t = partial(
            M.Transformer, attention_heads=2, linear_units=64, num_blocks=2,
            dropout_rate=0.2, positional_dropout_rate=0.2, attention_dropout_rate=0.2,
            normalize_before=True, concat_after=False, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=1, use_scaled_pos_enc=True, init_alpha=1.0,
            init_type="xavier_uniform",
        )
        c = BackboneConfig(kind="transformer", attention_heads=2, linear_units=64,
                           num_blocks=2, dropout=0.2, positional_dropout_rate=0.2,
                           attention_dropout_rate=0.2)
        return t, t, c, c
    if kind == "leanspeech":
        import optispeech.model.generator.modules.leanspeech as ls

        t = partial(ls.LeanSpeechBackbone, kernel_size=5, num_layers=2, drop_path=0.2)
        c = BackboneConfig(kind="leanspeech", kernel_size=5, num_layers=2, drop_path=0.2)
        return t, t, c, c
    if kind == "conformer":
        t = partial(
            M.Conformer, attention_heads=2, linear_units=64, num_blocks=2,
            dropout_rate=0.2, positional_dropout_rate=0.2, attention_dropout_rate=0.2,
            normalize_before=True, concat_after=False, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=1, macaron_style=True,
            pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
            activation_type="swish", use_cnn_module=True, cnn_module_kernel=7,
            zero_triu=False, init_type="xavier_uniform",
        )
        c = BackboneConfig(kind="conformer", attention_heads=2, linear_units=64,
                           num_blocks=2, dropout=0.2, positional_dropout_rate=0.2,
                           attention_dropout_rate=0.2, cnn_module_kernel=7,
                           conv_norm="affine")
        return t, t, c, c
    raise ValueError(kind)


def build_pair(kind, num_speakers=1, num_languages=1, separable=False, seed=0):
    """Build (torch generator, our GeneratorConfig, converted flax params)."""
    refgen, refwavenext, M = load_reference()
    torch.manual_seed(seed)
    conv_cls = M.ConvSeparable if separable else torch.nn.Conv1d
    tenc, tdec, cenc, cdec = _backbones(kind, M)
    dp_kw = dict(num_layers=2, intermediate_dim=48, kernel_size=3, dropout=0.1,
                 conv_layer_class=conv_cls)
    pp_kw = dict(num_layers=2, intermediate_dim=48, kernel_size=5, dropout=0.5,
                 embed_kernel_size=9, embed_dropout=0.2, conv_layer_class=conv_cls)
    tgen = refgen.OptiSpeechGenerator(
        dim=DIM,
        segment_size=16,
        text_embedding=partial(M.TextEmbedding, n_vocab=250, dropout=0.1,
                               padding_idx=0, max_source_positions=2000),
        encoder=tenc,
        duration_predictor=partial(M.DurationPredictor, **dp_kw),
        pitch_predictor=partial(M.PitchPredictor, **pp_kw),
        energy_predictor=partial(M.EnergyPredictor, **pp_kw),
        decoder=tdec,
        vocoder=partial(refwavenext.WaveNeXt, dim=48, intermediate_dim=96,
                        num_layers=2, drop_path=0.1),
        loss_coeffs=SimpleNamespace(lambda_align=5.0, lambda_duration=1.0,
                                    lambda_pitch=1.0, lambda_energy=1.0),
        feature_extractor=SimpleNamespace(**FEATS),
        num_speakers=num_speakers,
        num_languages=num_languages,
        data_statistics=None,
    )
    if kind == "conformer":
        # populate non-trivial BatchNorm running stats so the frozen-stat
        # folding in the converter is actually exercised
        tgen.train()
        with torch.no_grad():
            for _ in range(3):
                feats = torch.randn(2, 24, DIM)
                pad = torch.zeros(2, 24, dtype=torch.bool)
                tgen.encoder(feats, pad)
                tgen.decoder(torch.randn(2, 24, DIM), pad)
    tgen.eval()
    with torch.no_grad():
        # bias random-init log-durations toward small positive integers so the
        # synthesis has a meaningful frame count
        tgen.duration_predictor.linear.bias.fill_(0.8)

    vp = lambda **kw: VariancePredictorConfig(separable=separable, **kw)
    gen_cfg = GeneratorConfig(
        dim=DIM, segment_size=16, encoder=cenc, decoder=cdec,
        duration_predictor=vp(num_layers=2, intermediate_dim=48, kernel_size=3, dropout=0.1),
        pitch_predictor=vp(num_layers=2, intermediate_dim=48, kernel_size=5, dropout=0.5),
        energy_predictor=vp(num_layers=2, intermediate_dim=48, kernel_size=5, dropout=0.5),
        vocoder=VocoderConfig(dim=48, intermediate_dim=96, num_layers=2, drop_path=0.1),
        features=FeatureConfig(**FEATS),
        num_speakers=num_speakers, num_languages=num_languages,
    )
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_torch_generator_state_dict(sd, gen_cfg)
    return tgen, gen_cfg, params


def assert_synthesise_parity(tgen, gen_cfg, params, sids=None, lids=None,
                             b=2, t_text=16, seed=1, wav_atol=3e-4):
    rng = np.random.default_rng(seed)
    x = rng.integers(3, 150, (b, t_text)).astype(np.int64)
    x_lengths = np.array([t_text, t_text - 5][:b], np.int64)
    for i, n in enumerate(x_lengths):
        x[i, n:] = 0

    tkw = {}
    if sids is not None:
        tkw["sids"] = torch.tensor(sids, dtype=torch.long)
    if lids is not None:
        tkw["lids"] = torch.tensor(lids, dtype=torch.long)
    tout = tgen.synthesise(torch.tensor(x), torch.tensor(x_lengths), **tkw)
    twav = tout["wav"].numpy()
    tdur = tout["durations"].numpy()

    model = OptiSpeechGenerator(gen_cfg)
    jkw = {}
    if sids is not None:
        jkw["sids"] = jnp.asarray(sids, jnp.int32)
    if lids is not None:
        jkw["lids"] = jnp.asarray(lids, jnp.int32)
    enc = model.apply(
        {"params": params}, jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        **jkw, method=OptiSpeechGenerator.encode,
    )
    jdur = np.asarray(enc["durations"])
    np.testing.assert_array_equal(jdur, tdur)

    y_lengths = jdur.sum(1).astype(np.int32)
    n_frames = int(y_lengths.max())
    dec = model.apply(
        {"params": params}, enc["hidden"], enc["durations"], enc["x_mask"],
        jnp.asarray(y_lengths), n_frames, method=OptiSpeechGenerator.decode,
    )
    jwav = np.asarray(dec["wav"])
    assert twav.shape[-1] == n_frames * gen_cfg.features.hop_length

    f = gen_cfg.features
    for i in range(b):
        n = int(y_lengths[i]) * f.hop_length
        np.testing.assert_allclose(jwav[i, :n], twav[i, :n], atol=wav_atol, rtol=0)
        # the BASELINE flagship gate: mel-L1 <= 1e-2 between our synthesis and
        # the reference's, computed with the same mel frontend
        mel_j = np.asarray(log_mel_spectrogram(
            jnp.asarray(jwav[i, :n]), f.sample_rate, f.n_fft, f.hop_length,
            f.win_length, f.n_feats, f.f_min, f.f_max))
        mel_t = np.asarray(log_mel_spectrogram(
            jnp.asarray(twav[i, :n]), f.sample_rate, f.n_fft, f.hop_length,
            f.win_length, f.n_feats, f.f_min, f.f_max))
        mel_l1 = float(np.mean(np.abs(mel_j - mel_t)))
        assert mel_l1 <= 1e-2, f"mel-L1 {mel_l1} exceeds the parity gate"


@pytest.mark.parametrize(
    "kind", ["convnext", "lightspeech", "transformer", "conformer", "leanspeech"]
)
def test_reference_synthesise_parity(kind):
    tgen, gen_cfg, params = build_pair(kind, separable=(kind == "lightspeech"))
    assert_synthesise_parity(tgen, gen_cfg, params)


def test_reference_synthesise_parity_multispeaker():
    tgen, gen_cfg, params = build_pair("convnext", num_speakers=3, num_languages=2)
    assert_synthesise_parity(tgen, gen_cfg, params,
                             sids=np.array([2, 1]), lids=np.array([1, 0]))
