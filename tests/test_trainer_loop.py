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
    # host RSS series (evidence for the tunnel-client leak + guard)
    assert "perf/host_rss_gb" in csv

    # resume continues from the saved step
    trainer2 = Trainer(cfg, out_dir=out_dir)
    state2 = trainer2.init_or_restore_state()
    assert int(np.asarray(state2.step)) == 3

    # inference export from the trained state loads back
    trainer.export_inference_checkpoint(state, os.path.join(out_dir, "inf"))
    from optispeech_tpu.models.optispeech import OptiSpeech

    api = OptiSpeech.load_from_checkpoint(os.path.join(out_dir, "inf"))
    assert api.cfg.generator.dim == cfg.generator.dim


def test_resume_at_epoch_boundary_rolls_over(tmp_path):
    """A loader whose restored position sits at the END of the batch list
    (checkpoint cut exactly at an epoch boundary) must roll into the next
    epoch, not trip the empty-loader guard."""
    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000, ckpt_every_n_steps=100,
        num_devices=4,
    )
    feats = cfg.generator.features
    ds = SyntheticDataset(n_items=8, n_feats=feats.n_feats, hop_length=feats.hop_length,
                          text_range=(8, 16), mel_range=(32, 64))
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics, hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    loader = DataLoader(ds, 4, collate, shuffle=True, seed=3)
    n_batches = len(ds) // 4
    loader.load_state_dict({"epoch": 0, "pos": n_batches, "seed": 3})
    trainer = Trainer(cfg, out_dir=str(tmp_path / "run"))
    state = trainer.fit(loader, None, max_steps=1)
    assert int(np.asarray(state.step)) == 1


def test_forced_resume_restores_g_and_d_with_fresh_optimizers(tmp_path):
    """`--forced-resume` from a TRAIN checkpoint loads generator AND
    discriminator weights but restarts optimizers/step at zero (reference
    train.py:82-87: whole-module state_dict, ckpt_path=None afterwards)."""
    import jax

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000, ckpt_every_n_steps=100,
        num_devices=4,
    )
    feats = cfg.generator.features
    ds = SyntheticDataset(n_items=8, n_feats=feats.n_feats, hop_length=feats.hop_length,
                          text_range=(8, 16), mel_range=(32, 64))
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics, hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    trainer = Trainer(cfg, out_dir=str(tmp_path / "run"))
    state = trainer.fit(DataLoader(ds, 4, collate, shuffle=True), None, max_steps=2)
    ckpt_dir = os.path.join(str(tmp_path / "run"), cfg.ckpt_dir)

    trainer2 = Trainer(cfg, out_dir=str(tmp_path / "run2"))
    resumed = trainer2.init_or_restore_state(forced_resume_from=ckpt_dir)
    assert int(np.asarray(resumed.step)) == 0  # fresh counter -> pretraining restarts
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.g_params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.g_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.d_params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.d_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizers are fresh: Adam moments are all-zero
    moments = [
        np.abs(np.asarray(x)).sum()
        for x in jax.tree_util.tree_leaves(jax.device_get(resumed.g_opt_state))
    ]
    assert sum(moments) == 0.0


def test_resume_matches_uninterrupted_run(tmp_path):
    """Step-deterministic resume (VERDICT r1 item 8): train 2 steps, restart
    from the checkpoint with a FRESH loader, train 2 more — the final params
    must match one uninterrupted 4-step run, which requires the restored
    data-iterator position to replay the exact remaining batches."""
    import jax

    from optispeech_tpu.parallel import replicate_state
    from optispeech_tpu.training.state import init_train_state

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000, ckpt_every_n_steps=100,
        num_devices=4,
    )
    feats = cfg.generator.features
    ds = SyntheticDataset(n_items=16, n_feats=feats.n_feats, hop_length=feats.hop_length,
                          text_range=(8, 16), mel_range=(32, 64))
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics, hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    fresh_loader = lambda: DataLoader(ds, 4, collate, shuffle=True, seed=11)

    trainer = Trainer(cfg, out_dir=str(tmp_path / "run"))
    # interrupted run: stop mid-epoch at step 2 (finally-block checkpoints)
    trainer.fit(fresh_loader(), None, max_steps=2)

    # "process restart": new loader object, state restored from the checkpoint
    state_b = trainer.init_or_restore_state()
    assert int(np.asarray(state_b.step)) == 2
    loader_b = fresh_loader()
    state_b = trainer.fit(loader_b, None, max_steps=4, state=state_b)
    assert loader_b._pos == 4  # resumed at batch 2, consumed batches 2..3

    # oracle: uninterrupted 4-step run from scratch, same seeds
    state_o = replicate_state(
        init_train_state(cfg, trainer.generator, trainer.discriminator,
                         jax.random.PRNGKey(cfg.seed)),
        trainer.mesh,
    )
    state_o = trainer.fit(fresh_loader(), None, max_steps=4, state=state_o)

    flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.g_params))
    flat_o = jax.tree_util.tree_leaves(jax.device_get(state_o.g_params))
    for a, b in zip(flat_b, flat_o):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_rss_guard_checkpoints_and_flags_restart(tmp_path, monkeypatch):
    """Host-memory guard (trainer.py _default_rss_limit_kb): with a tiny
    threshold the trainer must checkpoint cleanly at a step boundary and set
    `rss_preempted` (cli/train.py then re-execs to shed leaked memory)."""
    monkeypatch.setenv("OPTISPEECH_MAX_RSS_GB", "0.001")  # far below any real RSS
    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000, ckpt_every_n_steps=1000,
        num_devices=1,
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
    out_dir = str(tmp_path / "run")
    trainer = Trainer(cfg, out_dir=out_dir)
    state = trainer.fit(train, None, max_steps=100)
    # the guard checks every 25 steps and requires step > start_step: it must
    # have stopped at the first boundary, not run to max_steps
    stopped_at = int(np.asarray(state.step))
    assert trainer.rss_preempted
    assert stopped_at < 100 and stopped_at >= 25
    # the preemption checkpoint must be restorable at the stopped step
    trainer2 = Trainer(cfg, out_dir=out_dir)
    state2 = trainer2.init_or_restore_state()
    assert int(np.asarray(state2.step)) == stopped_at
