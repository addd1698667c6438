"""Checkpoint-averaging CLI.

    python -m optispeech_tpu.cli.average RUN_DIR [-o OUT] [--last 5 | --steps ...]
        [--packed-val VAL.pak [--compare]]

Averages the generator weights over the last-N retained training checkpoints
of RUN_DIR (a `cli.train --out-dir`) and writes a one-call-restorable
inference checkpoint (`OptiSpeech.load_from_checkpoint(OUT)`); see
training/average.py for why tail-averaging helps a GAN generator. With
`--packed-val` it runs the Trainer's full validation pass (losses + MCD/STOI/
periodicity on real synthesis) on the averaged weights — `--compare` also
evaluates the newest un-averaged checkpoint so the delta is measured, and the
pair lands in RUN_DIR/avg_eval/compare.json.
"""

import argparse
import json
import os

import jax
import numpy as np


def _eval_params(trainer, loader, g_params, d_params, step):
    from ..parallel import replicate_state
    from ..training.state import TrainState

    state = TrainState(
        step=np.asarray(step, np.int32),
        g_params=g_params, d_params=d_params,
        g_opt_state=None, d_opt_state=None,
        rng=jax.random.PRNGKey(0),
    )
    return trainer.validate(replicate_state(state, trainer.mesh), loader, step)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", help="cli.train --out-dir (contains checkpoints/)")
    p.add_argument("-o", "--out", default=None,
                   help="output inference checkpoint (default RUN_DIR/avg_ckpt)")
    p.add_argument("--last", type=int, default=5,
                   help="average the newest N retained checkpoints")
    p.add_argument("--steps", type=int, nargs="+", default=None,
                   help="explicit checkpoint steps to average (overrides --last)")
    p.add_argument("--packed-val", default=None,
                   help="packed .pak val file: run full validation on the average")
    p.add_argument("--compare", action="store_true",
                   help="with --packed-val: also evaluate the newest checkpoint")
    args = p.parse_args(argv)

    from ..training.average import average_generator_params, load_run_config
    from ..training.checkpoint import save_inference_checkpoint
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    run = os.path.abspath(os.path.expanduser(args.run_dir))
    cfg = None
    ckpt_dir = None
    for cand in ("checkpoints",):
        d = os.path.join(run, cand)
        if os.path.isdir(d):
            ckpt_dir = d
            break
    if ckpt_dir is None:
        raise SystemExit(f"no checkpoints/ under {run}")
    cfg = load_run_config(ckpt_dir)

    avg, steps, last_raw = average_generator_params(
        ckpt_dir, steps=args.steps, last_n=args.last
    )
    out = args.out or os.path.join(run, "avg_ckpt")
    save_inference_checkpoint(out, cfg, avg)
    summary = {"averaged_steps": steps, "out": out}
    print(json.dumps(summary))

    if args.packed_val:
        from ..data.packed import PackedDataset, PackedLoader
        from ..training.trainer import Trainer

        trainer = Trainer(cfg, out_dir=os.path.join(run, "avg_eval"))
        ds = PackedDataset(args.packed_val, cfg.data.statistics,
                           f_min=cfg.generator.features.f_min)
        loader = PackedLoader(
            ds, cfg.data.batch_size, cfg.data.text_bucket_size,
            cfg.data.mel_bucket_size, shuffle=False, seed=cfg.data.seed,
            drop_last=False, max_text_len=cfg.data.max_text_len,
            max_mel_len=cfg.data.max_mel_len,
        )
        results = {}
        if args.compare:
            # newest checkpoint first, so the averaged pass's synth_wav_delta
            # tripwire measures avg-vs-last drift
            results["last"] = _eval_params(
                trainer, loader, last_raw["g_params"], last_raw["d_params"],
                step=int(last_raw["step"]),
            )
        results["averaged"] = _eval_params(
            trainer, loader, avg, last_raw["d_params"],
            step=int(last_raw["step"]) + 1,
        )
        cmp_path = os.path.join(run, "avg_eval", "compare.json")
        with open(cmp_path, "w") as f:
            json.dump({"averaged_steps": steps, **results}, f, indent=2)
        print(json.dumps({"compare": cmp_path, **{
            k: {m: round(v, 4) for m, v in r.items()
                if m.startswith(("val/", "total_loss/"))}
            for k, r in results.items()
        }}))


if __name__ == "__main__":
    main()
