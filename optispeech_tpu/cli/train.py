"""Training CLI (reference: python -m optispeech.train, optispeech/train.py).

Usage:
    python -m optispeech_tpu.cli.train --config default --out-dir runs/lj \
        [data.batch_size=64 ...] [--synthetic] [--fast-dev-run] [--overfit N]

Debug harnesses mirror the reference's configs/debug/ set: --fast-dev-run
(fdr.yaml), --overfit N (overfit.yaml), --limit FRac (limit.yaml),
--debug-nans (detect_anomaly).
"""

import argparse
import os
import sys

from ..utils.pylogger import get_pylogger
from ..utils.yamlcfg import load_experiment

log = get_pylogger("optispeech_tpu.train")


def build_loaders(cfg, synthetic: bool, overfit: int, limit: float,
                  packed_train: str = None, packed_val: str = None,
                  device_cache: bool = False, mesh=None,
                  cache_mel_dtype: str = "float32",
                  cache_wav_dtype: str = "float32"):
    from ..data.datamodule import BucketedCollate, DataLoader, SyntheticDataset, TextWavDataset

    if packed_train:
        # native mmapped arena + C++ batch assembly (production input path)
        from ..data.packed import PackedDataset, PackedLoader

        import jax

        def mk(path, shuffle):
            ds = PackedDataset(path, cfg.data.statistics, f_min=cfg.generator.features.f_min)
            return PackedLoader(
                ds, cfg.data.batch_size, cfg.data.text_bucket_size,
                cfg.data.mel_bucket_size, shuffle=shuffle, seed=cfg.data.seed,
                # val keeps partial batches: a val split smaller than the
                # batch size must still produce val metrics
                drop_last=shuffle,
                max_text_len=cfg.data.max_text_len, max_mel_len=cfg.data.max_mel_len,
                shard_id=jax.process_index(), num_shards=jax.process_count(),
            )

        if device_cache:
            # TPU-first input path: features live in HBM, the host ships only
            # integer indices per step (data/device_cache.py). Validation
            # stays on the host loader (it needs GT wavs for perceptual eval).
            from ..data.device_cache import DeviceCacheLoader, DeviceFeatureCache

            cache = DeviceFeatureCache(
                packed_train, cfg.data.statistics,
                f_min=cfg.generator.features.f_min, mesh=mesh,
                text_bucket=cfg.data.text_bucket_size,
                mel_bucket=cfg.data.mel_bucket_size,
                max_text_len=cfg.data.max_text_len,
                max_mel_len=cfg.data.max_mel_len,
                mel_dtype=cache_mel_dtype, wav_dtype=cache_wav_dtype,
            )
            train = DeviceCacheLoader(
                cache, cfg.data.batch_size, cfg.data.text_bucket_size,
                cfg.data.mel_bucket_size, shuffle=True, seed=cfg.data.seed,
                max_text_len=cfg.data.max_text_len,
                max_mel_len=cfg.data.max_mel_len,
                shard_id=jax.process_index(), num_shards=jax.process_count(),
            )
            return train, (mk(packed_val, False) if packed_val else None)
        return mk(packed_train, True), (mk(packed_val, False) if packed_val else None)

    collate = BucketedCollate(
        n_feats=cfg.generator.features.n_feats,
        statistics=cfg.data.statistics,
        hop_length=cfg.generator.features.hop_length,
        text_bucket=cfg.data.text_bucket_size,
        mel_bucket=cfg.data.mel_bucket_size,
        max_text_len=cfg.data.max_text_len,
        max_mel_len=cfg.data.max_mel_len,
    )
    if synthetic:
        train_ds = SyntheticDataset(
            n_items=max(cfg.data.batch_size * 4, 64),
            n_feats=cfg.generator.features.n_feats,
            hop_length=cfg.generator.features.hop_length,
        )
        val_ds = SyntheticDataset(
            n_items=cfg.data.batch_size, n_feats=cfg.generator.features.n_feats,
            hop_length=cfg.generator.features.hop_length, seed=1,
        )
    else:
        train_ds = TextWavDataset(cfg.data.train_filelist_path,
                                  f_min=cfg.generator.features.f_min, seed=cfg.data.seed)
        val_ds = TextWavDataset(cfg.data.valid_filelist_path,
                                f_min=cfg.generator.features.f_min)
    if overfit:
        train_ds.file_paths = train_ds.file_paths[: overfit * cfg.data.batch_size] \
            if hasattr(train_ds, "file_paths") else train_ds
        if hasattr(train_ds, "items"):
            train_ds.items = train_ds.items[: overfit * cfg.data.batch_size]
    if limit < 1.0 and hasattr(train_ds, "file_paths"):
        n = max(int(len(train_ds.file_paths) * limit), cfg.data.batch_size)
        train_ds.file_paths = train_ds.file_paths[:n]
    import jax

    shard = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
    train = DataLoader(train_ds, cfg.data.batch_size, collate, shuffle=True,
                       seed=cfg.data.seed, **shard)
    val = DataLoader(val_ds, cfg.data.batch_size, collate, shuffle=False,
                     drop_last=False, **shard)
    return train, val


def main(argv=None):
    p = argparse.ArgumentParser(description="Train OptiSpeech-TPU")
    p.add_argument("--config", default="default")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--synthetic", action="store_true", help="use synthetic data (smoke)")
    p.add_argument("--packed-train", default=None, help="packed .pak train file (native loader)")
    p.add_argument("--packed-val", default=None)
    p.add_argument("--device-cache", action="store_true",
                   help="preload the packed train features into device memory "
                        "once; each step ships only integer indices "
                        "(data/device_cache.py — requires --packed-train)")
    p.add_argument("--cache-mel-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="device-cache mel arena dtype (bfloat16 halves HBM)")
    p.add_argument("--cache-wav-dtype", default="float32",
                   choices=["float32", "int16"],
                   help="device-cache wav arena dtype (int16 halves the "
                        "largest arena — LJSpeech-scale corpora)")
    p.add_argument("--fast-dev-run", action="store_true")
    p.add_argument("--overfit", type=int, default=0, help="overfit N batches")
    p.add_argument("--limit", type=float, default=1.0, help="fraction of train data")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--forced-resume", default=None,
                   help="load generator weights from an inference checkpoint, fresh optimizers")
    p.add_argument("--profile-steps", default=None, help="START,STOP jax.profiler capture")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: jax.distributed.initialize() from the "
                        "cluster env (TPU pod / COORDINATOR_ADDRESS), per-host "
                        "data sharding (reference configs/trainer/ddp.yaml role)")
    p.add_argument("--no-print-config", action="store_true",
                   help="skip the effective-config tree at startup")
    p.add_argument("overrides", nargs="*", help="dotted config overrides key=value")
    args = p.parse_args(argv)

    import jax

    # persistent compile cache: the one-jit GAN step is a multi-minute XLA
    # compile on TPU; cache it across runs (same default as bench.py)
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    if args.distributed:
        jax.distributed.initialize()
        log.info(
            f"Distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )

    cfg = load_experiment(args.config, args.overrides)

    # auto-detect speaker/language counts from the preprocess outputs
    # (reference: data configs carry num_speakers; preprocess writes the maps)
    from pathlib import Path as _P

    from ..config import finalize, merge_overrides

    sid_map = _P(cfg.data.train_filelist_path).parent / "speaker_ids.json"
    if not args.synthetic and sid_map.exists() and cfg.data.num_speakers == 1:
        import json as _json

        n = len(_json.loads(sid_map.read_text()))
        if n > 1:
            cfg = finalize(merge_overrides(cfg, {"data.num_speakers": n}))
            log.info(f"Detected {n} speakers from {sid_map}")
    out_dir = args.out_dir or f"runs/{cfg.run_name}"

    # effective-config tree at startup (reference utils/rich_utils.py:18
    # print_config_tree role; plain YAML here — no rich dependency)
    if not args.no_print_config:
        import yaml as _yaml

        from ..config import to_dict

        log.info("Effective config:\n" + _yaml.safe_dump(
            to_dict(cfg), sort_keys=False, default_flow_style=False))

    from ..training.trainer import Trainer

    trainer = Trainer(cfg, out_dir=out_dir, debug_nans=args.debug_nans)
    if args.device_cache and not args.packed_train:
        p.error("--device-cache requires --packed-train")
    train_loader, val_loader = build_loaders(
        cfg, args.synthetic, args.overfit, args.limit,
        packed_train=args.packed_train, packed_val=args.packed_val,
        device_cache=args.device_cache, mesh=trainer.mesh,
        cache_mel_dtype=args.cache_mel_dtype,
        cache_wav_dtype=args.cache_wav_dtype,
    )
    log.info(f"Training `{cfg.run_name}` -> {out_dir}")
    state = trainer.init_or_restore_state(forced_resume_from=args.forced_resume)
    profile_steps = None
    if args.profile_steps:
        a, b = args.profile_steps.split(",")
        profile_steps = (int(a), int(b))
    state = trainer.fit(
        train_loader, val_loader, max_steps=args.max_steps, state=state,
        fast_dev_run=args.fast_dev_run, profile_steps=profile_steps,
    )
    if getattr(trainer, "rss_preempted", False):
        # the host-memory guard checkpointed cleanly (trainer.py
        # _default_rss_limit_kb: the device transport retains host memory per
        # byte transferred). Re-exec the identical command line in a FRESH
        # process — leaked memory is shed, init_or_restore_state resumes from
        # the checkpoint just written, and the data iterator continues at the
        # exact batch. Transparent to the caller: one `train` invocation
        # survives any number of restarts.
        log.warning("Re-executing the training process to shed leaked host memory")
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.orig_argv[1:])
    trainer.export_inference_checkpoint(state, f"{out_dir}/inference_ckpt")
    log.info("Done.")


if __name__ == "__main__":
    main()
