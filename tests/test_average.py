"""Checkpoint averaging (training/average.py + cli/average.py)."""

import json

import numpy as np
import pytest

from optispeech_tpu.training.average import (
    average_generator_params,
    load_run_config,
)
from optispeech_tpu.training.checkpoint import TrainCheckpointManager

from test_train_step import tiny_experiment


def _state(v: float):
    return {
        "step": np.asarray(int(v), np.int32),
        "g_params": {
            "dense": {
                "kernel": np.full((2, 3), float(v), np.float32),
                "bias": np.full((3,), float(v) * 10.0, np.float32),
            }
        },
        "d_params": {"w": np.full((1,), float(v) + 0.5, np.float32)},
        "g_opt_state": {"count": np.asarray(int(v), np.int32)},
        "d_opt_state": {"count": np.asarray(int(v), np.int32)},
        "rng": np.zeros((2,), np.uint32),
    }


@pytest.fixture()
def ckpt_dir(tmp_path):
    cfg = tiny_experiment()
    mgr = TrainCheckpointManager(str(tmp_path / "checkpoints"), keep=5)
    for s in (1, 2, 3):
        mgr.save(s, _state(s), cfg)
    mgr.wait()
    return str(tmp_path / "checkpoints")


def test_average_last_n(ckpt_dir):
    avg, steps, last_raw = average_generator_params(ckpt_dir, last_n=2)
    assert steps == [2, 3]
    np.testing.assert_allclose(avg["dense"]["kernel"], 2.5)
    np.testing.assert_allclose(avg["dense"]["bias"], 25.0)
    assert avg["dense"]["kernel"].dtype == np.float32
    # the newest raw state rides along for d_params reuse
    assert int(last_raw["step"]) == 3
    np.testing.assert_allclose(np.asarray(last_raw["d_params"]["w"]), 3.5)


def test_average_explicit_steps(ckpt_dir):
    avg, steps, _ = average_generator_params(ckpt_dir, steps=[1, 3])
    assert steps == [1, 3]
    np.testing.assert_allclose(avg["dense"]["kernel"], 2.0)


def test_average_missing_step_raises(ckpt_dir):
    with pytest.raises(ValueError, match="not retained"):
        average_generator_params(ckpt_dir, steps=[2, 7])


def test_load_run_config_roundtrip(ckpt_dir):
    cfg = tiny_experiment()
    loaded = load_run_config(ckpt_dir)
    assert loaded.data.batch_size == cfg.data.batch_size
    assert loaded.generator.features.hop_length == cfg.generator.features.hop_length


def test_eval_params_runs_validate_without_opt_states(tmp_path):
    """The CLI's eval path builds a TrainState with None optimizer states;
    Trainer.validate must run it and return the metrics dict."""
    import dataclasses

    import jax

    from optispeech_tpu.cli.average import _eval_params
    from optispeech_tpu.data.datamodule import (
        BucketedCollate,
        DataLoader,
        SyntheticDataset,
    )
    from optispeech_tpu.training.state import init_train_state
    from optispeech_tpu.training.trainer import Trainer

    cfg = dataclasses.replace(tiny_experiment(pretraining_steps=0), num_devices=4)
    feats = cfg.generator.features
    ds = SyntheticDataset(n_items=4, n_feats=feats.n_feats,
                          hop_length=feats.hop_length,
                          text_range=(8, 16), mel_range=(32, 64))
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics,
        hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    loader = DataLoader(ds, 4, collate, shuffle=False)
    trainer = Trainer(cfg, out_dir=str(tmp_path / "run"))
    full = jax.device_get(
        init_train_state(cfg, trainer.generator, trainer.discriminator,
                         jax.random.PRNGKey(0))
    )
    out = _eval_params(trainer, loader, full.g_params, full.d_params, step=1)
    assert "total_loss/val_total" in out
    assert np.isfinite(out["total_loss/val_total"])


def test_cli_writes_loadable_inference_checkpoint(ckpt_dir, tmp_path, capsys):
    """The CLI's averaging path writes a checkpoint that
    load_inference_checkpoint restores with the averaged weights."""
    import os

    from optispeech_tpu.cli.average import main
    from optispeech_tpu.training.checkpoint import load_inference_checkpoint

    run = os.path.dirname(ckpt_dir)  # run_dir containing checkpoints/
    out = str(tmp_path / "avg")
    main([run, "-o", out, "--last", "3"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["averaged_steps"] == [1, 2, 3]
    _, params, _ = load_inference_checkpoint(out)
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]), 2.0)
