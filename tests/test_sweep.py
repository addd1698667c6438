"""Hyperparameter sweep CLI: sampling, objective parsing, and a real
2-trial sweep over subprocess train runs (the working replacement for the
reference's unedited Optuna MNIST template, configs/hparams_search/)."""

import json
import math
import random

import pytest
import yaml

from optispeech_tpu.cli.sweep import best_of, main, read_objective, sample_space
from optispeech_tpu.config import to_dict

from test_train_step import tiny_experiment


def test_sample_space_samplers_and_determinism():
    space = {
        "optimizer.lr": {"log_uniform": [1e-5, 1e-3]},
        "scheduler.warmup_steps": {"int_uniform": [100, 2000]},
        "generator.decoder.num_layers": {"choice": [2, 4, 6]},
        "train_args.pretraining_steps": {"uniform": [100.0, 1000.0]},
    }
    a = sample_space(space, random.Random(7))
    b = sample_space(space, random.Random(7))
    assert a == b  # seeded determinism
    assert 1e-5 <= a["optimizer.lr"] <= 1e-3
    assert isinstance(a["scheduler.warmup_steps"], int)
    assert a["generator.decoder.num_layers"] in (2, 4, 6)
    assert 100.0 <= a["train_args.pretraining_steps"] <= 1000.0
    # log_uniform actually spreads over decades
    draws = [sample_space(space, random.Random(i))["optimizer.lr"] for i in range(64)]
    assert max(draws) / min(draws) > 10


def test_sample_space_rejects_unknown_sampler():
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_space({"x": {"grid": [1, 2]}}, random.Random(0))


def test_read_objective_and_best(tmp_path):
    d = tmp_path / "t0"
    d.mkdir()
    with open(d / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 1, "total_loss/val_total": 5.0}) + "\n")
        f.write(json.dumps({"step": 2, "total_loss/val_total": 3.0}) + "\n")
        f.write(json.dumps({"step": 2, "other": 1.0}) + "\n")
    assert read_objective(str(d), "total_loss/val_total") == 3.0
    assert read_objective(str(d), "missing") is None

    results = [
        {"trial": 0, "objective": 3.0, "returncode": 0},
        {"trial": 1, "objective": 2.0, "returncode": 0},
        {"trial": 2, "objective": 1.0, "returncode": 1},  # failed: excluded
        {"trial": 3, "objective": None, "returncode": 0},
    ]
    assert best_of(results, "min")["trial"] == 1
    assert best_of(results, "max")["trial"] == 0


def test_should_prune_median_stopping():
    from optispeech_tpu.cli.sweep import should_prune

    done = [[10.0, 8.0, 6.0], [9.0, 7.0, 5.0], [12.0, 9.0, 8.0]]
    # a trial tracking the pack is kept (best-so-far 7.5 < median 8.0 at k=2)
    assert not should_prune([9.5, 7.5], done, "min")
    # a clearly-worse trial is pruned (best-so-far 14 > median 8 at k=2)
    assert should_prune([15.0, 14.0], done, "min")
    # gates: too few evals / too few completed peers -> never prune
    assert not should_prune([15.0], done, "min", min_evals=2)
    assert not should_prune([15.0, 14.0], done[:1], "min", min_completed=2)
    # direction=max flips the comparison
    assert should_prune([0.1, 0.2], [[0.5, 0.6], [0.4, 0.7], [0.3, 0.8]], "max")
    assert not should_prune([0.6, 0.9], [[0.5, 0.6], [0.4, 0.7], [0.3, 0.8]], "max")


def test_objective_curve_tolerates_partial_line(tmp_path):
    from optispeech_tpu.cli.sweep import objective_curve

    d = tmp_path / "t"
    d.mkdir()
    with open(d / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 1, "m": 5.0}) + "\n")
        f.write(json.dumps({"step": 2, "m": 4.0}) + "\n")
        f.write('{"step": 3, "m": 3.')  # mid-write tail while the trial runs
    assert objective_curve(str(d), "m") == [5.0, 4.0]


def test_resume_skips_completed_trials(tmp_path, capsys):
    """--resume loads recorded trials and runs only the remainder (none here:
    all trials recorded -> no subprocess is launched)."""
    spec = {
        "base_config": "default", "trials": 2, "seed": 0,
        "objective": "total_loss/val_total", "direction": "min",
        "space": {"optimizer.lr": {"log_uniform": [1e-5, 1e-3]}},
    }
    spec_path = tmp_path / "spec.yaml"
    yaml.safe_dump(spec, open(spec_path, "w"))
    out = tmp_path / "sweep"
    out.mkdir()
    rows = [
        {"trial": 0, "params": {"optimizer.lr": 1e-4}, "objective": 3.0,
         "returncode": 0, "out_dir": str(out / "trial_000")},
        {"trial": 1, "params": {"optimizer.lr": 2e-4}, "objective": 2.0,
         "returncode": 0, "out_dir": str(out / "trial_001")},
    ]
    with open(out / "sweep_results.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    best = main([str(spec_path), "--out-dir", str(out), "--resume"])
    assert best["trial"] == 1 and best["objective"] == 2.0
    # no new rows were appended (both trials were already complete)
    assert len(open(out / "sweep_results.jsonl").readlines()) == 2


@pytest.mark.slow
def test_two_trial_sweep_end_to_end(tmp_path, capsys):
    base = to_dict(tiny_experiment(pretraining_steps=0))
    base["run_name"] = "sweep-tiny"
    base["val_every_n_steps"] = 2
    base["log_every_n_steps"] = 1
    base["data"]["batch_size"] = 8
    cfg_path = tmp_path / "tiny.yaml"
    yaml.safe_dump(base, open(cfg_path, "w"))

    spec = {
        "base_config": str(cfg_path),
        "trials": 2,
        "seed": 0,
        "objective": "total_loss/val_total",
        "direction": "min",
        "train_args": ["--synthetic", "--max-steps", "2"],
        "space": {"optimizer.lr": {"log_uniform": [1e-5, 1e-3]}},
    }
    spec_path = tmp_path / "spec.yaml"
    yaml.safe_dump(spec, open(spec_path, "w"))

    out = tmp_path / "sweep"
    best = main([str(spec_path), "--out-dir", str(out)])
    assert best["objective"] is not None

    lines = [json.loads(l) for l in open(out / "sweep_results.jsonl")]
    assert len(lines) == 2
    assert all(r["returncode"] == 0 for r in lines)
    assert lines[0]["params"]["optimizer.lr"] != lines[1]["params"]["optimizer.lr"]

    # --report re-prints without re-running
    capsys.readouterr()
    main([str(spec_path), "--out-dir", str(out), "--report"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["best_trial"] == best["trial"]


def test_best_of_constraints(tmp_path):
    """A trial violating a constraint (e.g. the voicing floor, VERDICT r4
    item 3) cannot win regardless of its objective; constraint metrics are
    read from the trial dir when the results row lacks them."""
    import os

    rows = []
    for i, (mcd, f1) in enumerate([(50.0, 0.05), (60.0, 0.4), (70.0, 0.9)]):
        d = tmp_path / f"trial_{i:03d}"
        os.makedirs(d)
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"step": 100, "val/mcd": mcd, "val/f1_score": f1}) + "\n")
        rows.append({"trial": i, "objective": mcd, "returncode": 0,
                     "out_dir": str(d), "params": {}})
    cons = [{"metric": "val/f1_score", "op": ">=", "value": 0.3}]
    # trial 0 has the best mcd but fails the f1 floor -> trial 1 wins
    best = best_of(rows, "min", constraints=cons)
    assert best["trial"] == 1
    # without constraints trial 0 wins
    assert best_of(rows, "min")["trial"] == 0
    # all excluded -> None
    assert best_of(rows, "min", constraints=[
        {"metric": "val/f1_score", "op": ">=", "value": 0.95}]) is None
