"""Trainer orchestration: fit on synthetic data with validation + sample
logging + checkpointing, then resume."""

import dataclasses
import os

import numpy as np

from optispeech_tpu.data.datamodule import BucketedCollate, DataLoader, SyntheticDataset
from optispeech_tpu.training.trainer import Trainer

from test_train_step import tiny_experiment


def test_trainer_fit_val_ckpt_and_resume(tmp_path):
    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=1, val_every_n_steps=2, ckpt_every_n_steps=2,
        num_devices=4,  # batch 4 must divide the mesh
        train_args=dataclasses.replace(cfg.train_args, evaluate_periodicity=True),
    )
    feats = cfg.generator.features
    ds = SyntheticDataset(n_items=8, n_feats=feats.n_feats, hop_length=feats.hop_length,
                          text_range=(8, 16), mel_range=(32, 64))
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics, hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    train = DataLoader(ds, 4, collate, shuffle=True)
    val = DataLoader(ds, 4, collate, shuffle=False)

    out_dir = str(tmp_path / "run")
    trainer = Trainer(cfg, out_dir=out_dir)
    state = trainer.fit(train, val, max_steps=3)
    assert int(np.asarray(state.step)) == 3
    assert os.path.exists(os.path.join(out_dir, "metrics.csv"))
    csv = open(os.path.join(out_dir, "metrics.csv")).read()
    assert "total_loss/val_total" in csv
    assert "val/f1_score" in csv

    # resume continues from the saved step
    trainer2 = Trainer(cfg, out_dir=out_dir)
    state2 = trainer2.init_or_restore_state()
    assert int(np.asarray(state2.step)) == 3

    # inference export from the trained state loads back
    trainer.export_inference_checkpoint(state, os.path.join(out_dir, "inf"))
    from optispeech_tpu.models.optispeech import OptiSpeech

    api = OptiSpeech.load_from_checkpoint(os.path.join(out_dir, "inf"))
    assert api.cfg.generator.dim == cfg.generator.dim
