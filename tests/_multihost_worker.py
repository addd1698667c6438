"""Worker process for the 2-process CPU data-parallel integration test.

Run as: python tests/_multihost_worker.py PROC_ID NPROC PORT OUT_JSON

Each process gets 2 virtual CPU devices (4 global for nproc=2), initializes
jax.distributed with gloo CPU collectives, feeds only its own shard of the
global batch through DataLoader(shard_id=..., num_shards=...), and runs one
compiled GAN train step over the global mesh. With nproc=1 it runs the same
program single-process on 4 devices — the oracle the distributed run must
match (the CPU analogue of multi-host TPU DP; reference configs/trainer/ddp.yaml).
"""

import json
import os
import sys


def main():
    proc_id, nproc, port, out_json = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    local_devices = 4 // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root -> optispeech_tpu

    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the multi-minute CPU GAN-step compile is paid
    # once across workers/runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=proc_id
        )
    assert jax.device_count() == 4, jax.devices()

    import numpy as np

    from optispeech_tpu.data.datamodule import BucketedCollate, DataLoader, SyntheticDataset
    from optispeech_tpu.parallel import make_mesh, replicate_state, shard_batch
    from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
    from optispeech_tpu.models.generator import OptiSpeechGenerator
    from optispeech_tpu.training.state import init_train_state
    from optispeech_tpu.training.step import make_train_step
    from test_train_step import tiny_experiment

    cfg = tiny_experiment(pretraining_steps=0)
    # all utterances inside one (text, mel) bucket so any batch slice collates
    # to identical static shapes — required for shard-exact reassembly
    ds = SyntheticDataset(
        n_items=16, n_feats=cfg.generator.features.n_feats,
        hop_length=cfg.generator.features.hop_length,
        text_range=(10, 16), mel_range=(48, 64), seed=7,
    )
    collate = BucketedCollate(
        n_feats=cfg.generator.features.n_feats, statistics=cfg.data.statistics,
        hop_length=cfg.generator.features.hop_length,
        text_bucket=cfg.data.text_bucket_size, mel_bucket=cfg.data.mel_bucket_size,
    )
    loader = DataLoader(
        ds, batch_size=4, collate=collate, shuffle=True, seed=3,
        shard_id=proc_id, num_shards=nproc,
    )

    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate_state(state, mesh)
    step_fn = make_train_step(cfg, generator, discriminator)

    losses = []
    batch = next(iter(loader))
    batch = {k: v for k, v in batch.items()
             if k in ("x", "wav", "mel", "x_lengths", "wav_lengths", "mel_lengths",
                      "energies", "pitches", "sids", "lids")}
    batch = shard_batch(batch, mesh)
    # AOT-compile, then meet at a coordination-service barrier BEFORE the
    # first execution: gloo's rendezvous has a ~30 s handshake timeout, and
    # under load the two processes' multi-minute compiles can skew past it.
    # Compiling first makes both sides reach the first collective together.
    compiled = step_fn.lower(state, batch).compile()
    if nproc > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier("compiled", 600_000)
    for _ in range(2):
        state, logs = compiled(state, batch)
        losses.append(float(jax.device_get(logs["total_loss/generator"])))

    with open(out_json, "w") as f:
        json.dump({
            "proc_id": proc_id,
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "g_losses": losses,
            "d_loss": float(jax.device_get(logs["total_loss/discriminator"])),
        }, f)
    print(f"proc {proc_id}: ok {losses}", flush=True)


if __name__ == "__main__":
    main()
