"""LJSpeech-scale device-cache demonstration (VERDICT r4 item 5).

Proves `data/device_cache.py`'s scale claim on a real 13k-utterance corpus:
generate a synthetic corpus the size of LJSpeech (reference
configs/data/ljspeech.yaml trains on 13,100 utts,
text_wav_datamodule.py:196-266 feeds it from the host EVERY step), run the
full production input path (preprocess -> stats -> pack -> device-cache
upload), then train >= 5k steps at batch 128 with the features resident in
HBM. Evidence out: arena GB + upload seconds (device_cache log), steps/s and
host-RSS series (metrics.csv), HBM in-use after upload.

Usage:
    python scripts/scale_demo.py --work-dir runs/scale_demo \
        [--n-utterances 13200] [--max-steps 5000] \
        [--evidence-dir docs/evidence/scale_r5]
"""

import argparse
import csv
import importlib.util
import json
import re
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location("campaign", REPO / "scripts" / "campaign.py")
campaign = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("campaign", campaign)
_spec.loader.exec_module(campaign)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default=str(REPO / "runs" / "scale_demo"))
    p.add_argument("--n-utterances", type=int, default=13200)
    p.add_argument("--max-steps", type=int, default=5000)
    p.add_argument("--evidence-dir", default=str(REPO / "docs/evidence/scale_r5"))
    p.add_argument("--f0-jitter", type=float, default=0.2)
    args = p.parse_args(argv)

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    log = work / "scale_demo.log"
    stage_t = {}

    t0 = time.time()
    corpus = campaign.stage_corpus(work, args.n_utterances, log, f0_jitter=args.f0_jitter)
    stage_t["corpus_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    pre = campaign.stage_preprocess(work, corpus, log)
    stage_t["preprocess_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    stats = campaign.stage_stats(work, pre, log)
    train_pak, val_pak = campaign.stage_pack(work, pre, log)
    stage_t["stats_pack_s"] = round(time.time() - t0, 1)
    pak_gb = train_pak.stat().st_size / 1e9

    # train with the int16-wav / bf16-mel arenas (the LJSpeech-scale layout:
    # f32 everywhere would be ~2x the HBM for zero trajectory benefit — the
    # collate clips wav to [-1,1] and mels ride the bf16 wire in campaigns)
    out_dir = work / "run"
    t0 = time.time()
    while campaign._latest_ckpt_step(out_dir) < args.max_steps:
        before = campaign._latest_ckpt_step(out_dir)
        campaign.run([sys.executable, "-m", "optispeech_tpu.cli.train",
                      "--config", "campaign-ms",
                      "--packed-train", train_pak, "--packed-val", val_pak,
                      "--device-cache",
                      "--cache-wav-dtype", "int16", "--cache-mel-dtype", "bfloat16",
                      "--out-dir", out_dir, "--max-steps", args.max_steps,
                      "--no-print-config",
                      f"data.train_filelist_path={pre / 'train.txt'}",
                      f"data.valid_filelist_path={pre / 'val.txt'}",
                      f"scheduler.num_training_steps={args.max_steps}",
                      "val_every_n_steps=1000", "ckpt_every_n_steps=1000",
                      *campaign.stats_overrides(stats)],
                     cpu=False, log_path=log, check=False)
        if campaign._latest_ckpt_step(out_dir) <= before:
            raise SystemExit(f"train made no progress; see {log}")
    stage_t["train_s"] = round(time.time() - t0, 1)

    # harvest evidence
    logtext = log.read_text()
    cache_lines = [l for l in logtext.splitlines() if "Device feature cache" in l]
    m = re.search(
        r"(\d+) items, arenas \((\d+) text, (\d+) mel, (\d+) wav\) = ([\d.]+) GB "
        r"enqueued to device(?:; HBM ([\d.]+)(?:/([\d.]+))? GB in use)?",
        cache_lines[-1] if cache_lines else "",
    )
    # startup latency evidence: cache-enqueue timestamp -> first logged step
    # (includes the first-step compile; the upload overlaps it by design)
    first_step_s = None
    stamps = re.findall(r"^\[([0-9-]+ [0-9:,]+)\].*(Device feature cache|step \d+:)",
                        logtext, re.M)
    try:
        from datetime import datetime

        t_cache = next(datetime.strptime(s.replace(",", "."), "%Y-%m-%d %H:%M:%S.%f")
                       for s, kind in stamps if kind == "Device feature cache")
        t_step = next(datetime.strptime(s.replace(",", "."), "%Y-%m-%d %H:%M:%S.%f")
                      for s, kind in stamps if kind.startswith("step"))
        first_step_s = (t_step - t_cache).total_seconds()
    except (StopIteration, ValueError):
        pass
    steps_per_sec, rss_gb = [], []
    with open(out_dir / "metrics.csv") as f:
        for row in csv.DictReader(f):
            if row["metric"] == "perf/steps_per_sec":
                steps_per_sec.append((int(row["step"]), float(row["value"])))
            elif row["metric"] == "perf/host_rss_gb":
                rss_gb.append((int(row["step"]), float(row["value"])))
    sp = [v for _, v in steps_per_sec[2:]]  # drop compile-containing windows
    ev = Path(args.evidence_dir)
    ev.mkdir(parents=True, exist_ok=True)
    summary = {
        "n_utterances": args.n_utterances,
        "max_steps": args.max_steps,
        "train_pak_gb": round(pak_gb, 2),
        "stage_seconds": stage_t,
        "cache": None if not m else {
            "items": int(m.group(1)),
            "t_text": int(m.group(2)), "t_mel": int(m.group(3)),
            "t_wav": int(m.group(4)),
            "arena_gb": float(m.group(5)),
            "hbm_in_use_gb": float(m.group(6)) if m.group(6) else None,
            "hbm_limit_gb": float(m.group(7)) if m.group(7) else None,
        },
        "enqueue_to_first_step_s": first_step_s,
        "steps_per_sec": {
            "median_steady": sorted(sp)[len(sp) // 2] if sp else None,
            "max": max(sp) if sp else None,
            "wall_average": args.max_steps / stage_t["train_s"],
        },
        "host_rss_gb": {
            "first": rss_gb[0][1] if rss_gb else None,
            "last": rss_gb[-1][1] if rss_gb else None,
            "max": max(v for _, v in rss_gb) if rss_gb else None,
            "series_len": len(rss_gb),
        },
        "finished_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (ev / "scale_demo.json").write_text(json.dumps(summary, indent=2))
    shutil.copy(out_dir / "metrics.csv", ev / "metrics.csv")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
