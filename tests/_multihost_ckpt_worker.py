"""Worker for the 2-process checkpoint/resume integration test (VERDICT r3
item 5).

Run as: python tests/_multihost_ckpt_worker.py PROC_ID NPROC PORT OUT_JSON \
            WORK_DIR MAX_STEPS

Each process gets 2 virtual CPU devices (4 global for nproc=2), initializes
jax.distributed (gloo), builds a Trainer over a shared WORK_DIR and runs
`fit(max_steps=MAX_STEPS)` on its DataLoader shard. The Trainer's own
checkpoint machinery runs exactly as in production: process 0 writes the
orbax checkpoint + loader state, both processes restore on the next launch.
The final generator params digest goes to OUT_JSON.
"""

import json
import os
import sys


def main():
    proc_id, nproc, port, out_json, work_dir, max_steps = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], int(sys.argv[6]),
    )
    local_devices = 4 // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=proc_id
        )
    assert jax.device_count() == 4, jax.devices()

    import dataclasses

    import numpy as np

    from optispeech_tpu.data.datamodule import BucketedCollate, DataLoader, SyntheticDataset
    from optispeech_tpu.training.trainer import Trainer
    from test_train_step import tiny_experiment

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000,
        ckpt_every_n_steps=100, num_devices=4, seed=5,
    )
    feats = cfg.generator.features
    # one (text, mel) bucket so every shard slice collates to the same
    # static shapes (same construction as _multihost_worker.py)
    ds = SyntheticDataset(n_items=16, n_feats=feats.n_feats,
                          hop_length=feats.hop_length,
                          text_range=(10, 16), mel_range=(48, 64), seed=7)
    collate = BucketedCollate(
        n_feats=feats.n_feats, statistics=cfg.data.statistics,
        hop_length=feats.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.text_bucket_size, max_mel_len=cfg.data.mel_bucket_size,
    )
    loader = DataLoader(ds, 4, collate, shuffle=True, seed=3,
                        shard_id=proc_id, num_shards=nproc)

    trainer = Trainer(cfg, out_dir=work_dir)
    state = trainer.fit(loader, None, max_steps=max_steps)

    g = jax.device_get(state.g_params)
    digest = [float(np.asarray(x, np.float64).sum()) for x in jax.tree_util.tree_leaves(g)]
    with open(out_json, "w") as f:
        json.dump({
            "proc_id": proc_id,
            "step": int(np.asarray(jax.device_get(state.step))),
            "digest": digest,
        }, f)
    print(f"proc {proc_id}: step {int(np.asarray(jax.device_get(state.step)))}", flush=True)


if __name__ == "__main__":
    main()
