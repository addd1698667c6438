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

import faulthandler
import json
import os
import sys

# hang diagnostics: if a cohort wedges (observed: both processes futex-idle
# >20 min under full-suite load), dump every thread's stack to stderr every
# 5 min so the test's captured output shows WHERE (stderr is merged into the
# test's stdout capture)
faulthandler.dump_traceback_later(300, repeat=True, exit=False)


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
        # Establish the 4-DEVICE gloo clique while the processes are ALIGNED.
        # XLA's gloo rendezvous at the first collective has a fixed 30 s
        # kv-store timeout with no knob; the two processes can reach their
        # first big-program collective >30 s apart (observed: one process
        # loads a cached AOT train step while the peer compiles it for
        # ~90 s), and the early side dies with "Gloo context initialization
        # failed: DEADLINE_EXCEEDED ... cpu:gloo/0,1,2048,2049". The
        # coordination-service barrier is plain TCP to process 0 with a long
        # configurable timeout — align on it, then run one tiny ALL-DEVICE
        # collective so the 4-device clique's TCP pairs exist before the
        # skew-prone big compiles (sync_global_devices is NOT enough: its
        # allgather runs on the 2-rank process-level clique).
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier("gloo_warmup_align", 600_000)
        import jax.numpy as jnp
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as _P

        _mesh = Mesh(_np.array(jax.devices()), ("d",))
        _x = jax.make_array_from_callback(
            (jax.device_count(),), NamedSharding(_mesh, _P("d")),
            lambda idx: _np.ones((1,), _np.float32),
        )
        _y = jax.jit(jnp.sum, out_shardings=NamedSharding(_mesh, _P()))(_x)
        assert float(_np.asarray(_y.addressable_data(0))) == jax.device_count()
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
