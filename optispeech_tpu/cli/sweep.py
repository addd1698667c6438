"""Hyperparameter sweep CLI (random search over dotted config overrides).

Role parity with the reference's Optuna sweeper integration
(/root/reference/configs/hparams_search/mnist_optuna.yaml + train.py:127
"metric retrieval for Optuna sweeps") — which in the reference is an unedited
MNIST template that cannot run against any TTS experiment. Here: a working
random-search driver. Each trial launches the real train CLI in a fresh
subprocess (clean jit caches / device state), reads the objective metric from
the trial's metrics.jsonl, and appends one JSON line per trial to
`sweep_results.jsonl`; the best trial is reported (and re-printable with
`--report`).

Sweep spec YAML:

    base_config: default          # configs/<name>.yaml or a path
    trials: 8
    seed: 0
    objective: total_loss/val_total   # metric name in metrics.jsonl
    direction: min                # or max
    train_args: ["--synthetic", "--max-steps", "200"]  # extra CLI args
    overrides: ["val_every_n_steps=100"]               # fixed for all trials
    space:
      optimizer.lr: {log_uniform: [1.0e-5, 1.0e-3]}
      scheduler.warmup_steps: {int_uniform: [100, 2000]}
      generator.decoder.num_layers: {choice: [2, 4, 6]}
      train_args.pretraining_steps: {uniform: [100.0, 1000.0]}

Usage:
    optispeech-tpu-sweep SPEC.yaml --out-dir sweeps/lr_search
    optispeech-tpu-sweep SPEC.yaml --out-dir sweeps/lr_search --report
"""

import argparse
import json
import math
import os
import random
import subprocess
import sys

import yaml

from ..utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def sample_space(space: dict, rnd: random.Random) -> dict:
    """One random draw from the search space (one sampler key per param)."""
    draw = {}
    for param, spec in space.items():
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(f"space entry {param!r} must be one {{sampler: args}} mapping")
        (kind, args), = spec.items()
        if kind == "choice":
            draw[param] = rnd.choice(list(args))
        elif kind == "uniform":
            lo, hi = args
            draw[param] = rnd.uniform(float(lo), float(hi))
        elif kind == "log_uniform":
            lo, hi = args
            draw[param] = math.exp(rnd.uniform(math.log(float(lo)), math.log(float(hi))))
        elif kind == "int_uniform":
            lo, hi = args
            draw[param] = rnd.randint(int(lo), int(hi))
        else:
            raise ValueError(
                f"unknown sampler {kind!r} for {param!r} "
                "(choice | uniform | log_uniform | int_uniform)"
            )
    return draw


def read_objective(out_dir: str, metric: str):
    """Last value of `metric` in the trial's metrics.jsonl (None if absent)."""
    path = os.path.join(out_dir, "metrics.jsonl")
    value = None
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if metric in row:
                    value = float(row[metric])
    return value


def run_trial(i: int, spec: dict, draw: dict, trial_dir: str) -> dict:
    overrides = list(spec.get("overrides", [])) + [
        f"{k}={v}" for k, v in draw.items()
    ]
    cmd = [
        sys.executable, "-m", "optispeech_tpu.cli.train",
        "--config", str(spec.get("base_config", "default")),
        "--out-dir", trial_dir, "--no-print-config",
        *map(str, spec.get("train_args", [])),
        *overrides,
    ]
    log.info(f"trial {i}: {draw}")
    # the subprocess must import optispeech_tpu whether or not the package is
    # pip-installed: prepend the repo root (NEVER overwrite PYTHONPATH — the
    # image uses it to register the TPU jax plugin)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    value = read_objective(trial_dir, spec.get("objective", "total_loss/val_total"))
    if proc.returncode != 0:
        log.warning(f"trial {i} failed rc={proc.returncode}: "
                    f"{proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ''}")
    return {
        "trial": i, "params": draw, "objective": value,
        "returncode": proc.returncode, "out_dir": trial_dir,
    }


def best_of(results: list[dict], direction: str) -> dict | None:
    scored = [r for r in results if r.get("objective") is not None and r["returncode"] == 0]
    if not scored:
        return None
    key = lambda r: r["objective"]
    return min(scored, key=key) if direction == "min" else max(scored, key=key)


def main(argv=None):
    p = argparse.ArgumentParser(description="Random-search hyperparameter sweep")
    p.add_argument("spec", help="sweep spec YAML (see module docstring)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--report", action="store_true",
                   help="just re-print results from a finished sweep")
    args = p.parse_args(argv)

    with open(args.spec) as f:
        spec = yaml.safe_load(f)
    direction = spec.get("direction", "min")
    results_path = os.path.join(args.out_dir, "sweep_results.jsonl")

    if args.report:
        with open(results_path) as f:
            results = [json.loads(l) for l in f]
    else:
        os.makedirs(args.out_dir, exist_ok=True)
        if os.path.exists(results_path):
            # a fresh sweep must not mix with a previous run's trials
            # (duplicate trial indices would corrupt --report / best_of)
            os.replace(results_path, results_path + ".old")
            log.info(f"previous results moved to {results_path}.old")
        rnd = random.Random(spec.get("seed", 0))
        results = []
        for i in range(int(spec.get("trials", 8))):
            draw = sample_space(spec.get("space", {}), rnd)
            trial_dir = os.path.join(args.out_dir, f"trial_{i:03d}")
            result = run_trial(i, spec, draw, trial_dir)
            results.append(result)
            with open(results_path, "a") as f:
                f.write(json.dumps(result) + "\n")
            log.info(f"trial {i}: objective={result['objective']}")

    best = best_of(results, direction)
    if best is None:
        raise SystemExit("no trial produced the objective metric")
    print(json.dumps({"best_trial": best["trial"], "objective": best["objective"],
                      "params": best["params"], "out_dir": best["out_dir"]}))
    return best


if __name__ == "__main__":
    main()
