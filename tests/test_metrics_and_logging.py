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
    assert ml.wandb is None
    ml.log(1, {"m": 1.0})
    ml.close()


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