"""Direction-aware campaign metric audit + quality gate (VERDICT r3 item 6)."""

import csv
import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("campaign", REPO / "scripts" / "campaign.py")
campaign = importlib.util.module_from_spec(spec)
sys.modules["campaign"] = campaign
spec.loader.exec_module(campaign)


def _write_metrics(path, rows):
    with open(path / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["step", "metric", "value"])
        w.writeheader()
        for step, metric, value in rows:
            w.writerow({"step": step, "metric": metric, "value": value})


def test_audit_direction_and_gate(tmp_path):
    rows = []
    # AM loss that regresses after disc-on (step 500): 10 -> 8 -> 9.5
    for step, v in [(250, 10.0), (500, 8.0), (1000, 9.5)]:
        rows.append((step, "gen_subloss/val_align_loss", v))
    # AM loss that keeps improving: 0.05 -> 0.04 -> 0.03
    for step, v in [(250, 0.05), (500, 0.04), (1000, 0.03)]:
        rows.append((step, "gen_subloss/val_duration_loss", v))
    # adversarial total falls (improving, not gated)
    for step, v in [(250, 120.0), (500, 100.0), (1000, 60.0)]:
        rows.append((step, "total_loss/val_total", v))
    # quality targets: mcd misses 75, stoi meets 0.45
    for step, v in [(250, 95.0), (500, 90.0), (1000, 82.0)]:
        rows.append((step, "val/mcd", v))
    for step, v in [(250, 0.30), (500, 0.40), (1000, 0.50)]:
        rows.append((step, "val/stoi", v))
    # higher-better metric improving
    for step, v in [(250, 0.5), (500, 0.6), (1000, 0.7)]:
        rows.append((step, "val/f1_score", v))
    # frozen metric
    for step in (250, 500, 1000):
        rows.append((step, "val/periodicity_loss", 0.123))
    _write_metrics(tmp_path, rows)

    audit = campaign.audit_metrics(tmp_path, disc_on_step=500)

    a = audit["gen_subloss/val_align_loss"]
    assert a["at_disc_on"] == 8.0 and a["last"] == 9.5
    assert a["direction"] == "regressing" and a["pass"] is False

    d = audit["gen_subloss/val_duration_loss"]
    assert d["direction"] == "improving" and d["pass"] is True

    assert audit["total_loss/val_total"]["direction"] == "improving"
    assert audit["val/f1_score"]["direction"] == "improving"  # higher-better
    assert audit["val/mcd"]["quality_met"] is False
    assert audit["val/stoi"]["quality_met"] is True
    assert audit["val/periodicity_loss"]["moves"] is False

    ok, failures = campaign.quality_verdict(audit)
    assert not ok
    joined = "\n".join(failures)
    assert "val_align_loss" in joined and "regressing" in joined
    assert "val/mcd" in joined and "misses target" in joined
    assert "val/periodicity_loss: frozen" in joined


def test_audit_passes_on_healthy_run(tmp_path):
    rows = []
    for m, series in {
        "gen_subloss/val_align_loss": [5.0, 4.0, 3.9],
        "gen_subloss/val_pitch_loss": [0.5, 0.4, 0.4],  # flat within 2%
        "val/mcd": [90.0, 80.0, 70.0],
        "val/stoi": [0.3, 0.42, 0.5],
        "val/f1_score": [0.5, 0.6, 0.75],
    }.items():
        for step, v in zip((250, 500, 1000), series):
            rows.append((step, m, v))
    _write_metrics(tmp_path, rows)
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500)
    assert audit["gen_subloss/val_pitch_loss"]["direction"] == "flat"
    ok, failures = campaign.quality_verdict(audit)
    assert ok, failures


def test_audit_quality_targets_override(tmp_path):
    """--target-mcd/--target-stoi recalibrate the gate per corpus; the same
    run flips between PASS and FAIL only through the explicit, recorded
    targets."""
    rows = []
    for m, series in {
        "gen_subloss/val_align_loss": [5.0, 4.0, 3.9],
        "val/mcd": [95.0, 90.0, 80.0],
        "val/stoi": [0.2, 0.25, 0.30],
    }.items():
        for step, v in zip((250, 500, 1000), series):
            rows.append((step, m, v))
    _write_metrics(tmp_path, rows)

    # default bars: mcd 80 > 75 and stoi 0.30 < 0.45 both fail
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500)
    ok, failures = campaign.quality_verdict(audit)
    assert not ok and len(failures) == 2

    # recalibrated bars for this corpus: both met
    targets = {"val/mcd": ("<=", 82.0), "val/stoi": (">=", 0.28)}
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500,
                                   quality_targets=targets)
    assert audit["val/mcd"]["quality_target"] == "<= 82.0"
    assert audit["val/mcd"]["quality_met"] is True
    assert audit["val/stoi"]["quality_met"] is True
    ok, failures = campaign.quality_verdict(audit, quality_targets=targets)
    assert ok, failures


def test_voicing_collapse_fails_gate(tmp_path):
    """VERDICT r4 weak 4: an r4c-style voicing collapse after disc-on
    (f1 0.86->0.35, periodicity 0.48->0.80) must FAIL the gate even when
    mcd/stoi targets are met; r4b's healthy dip-and-recover
    (f1 0.86->0.755 = -12%) must pass the voicing rule."""
    collapse = []
    for m, series in {
        "val/f1_score": [0.86, 0.86, 0.35],
        "val/periodicity_loss": [0.50, 0.48, 0.80],
        "val/mcd": [90.0, 80.0, 70.0],
        "val/stoi": [0.3, 0.42, 0.5],
    }.items():
        for step, v in zip((250, 500, 1000), series):
            collapse.append((step, m, v))
    _write_metrics(tmp_path, collapse)
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500)
    ok, failures = campaign.quality_verdict(audit)
    assert not ok
    joined = "\n".join(failures)
    assert "val/f1_score" in joined and "voicing-collapse" in joined
    assert "val/periodicity_loss" in joined

    healthy = [r for r in collapse if r[1] not in ("val/f1_score", "val/periodicity_loss")]
    for step, v in zip((250, 500, 1000), [0.86, 0.86, 0.755]):
        healthy.append((step, "val/f1_score", v))
    for step, v in zip((250, 500, 1000), [0.81, 0.70, 0.45]):
        healthy.append((step, "val/periodicity_loss", v))
    _write_metrics(tmp_path, healthy)
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500)
    ok, failures = campaign.quality_verdict(audit)
    assert ok, failures


def test_derive_targets_from_calibration(tmp_path):
    """Gate targets come from the measured re-synthesis ceiling via the
    stated _GATE_FRACTIONS (VERDICT r4 item 4)."""
    import json

    cal = tmp_path / "gate_calibration.json"
    cal.write_text(json.dumps({
        "method": "test", "n_utts": 4, "f0_jitter": 0.2,
        "ceiling": {"mcd": 60.0, "stoi": 0.70, "periodicity_loss": 0.30,
                    "f1_score": 0.90},
        "per_utt": [],
    }))
    targets, derivation = campaign.derive_targets(cal)
    assert targets["val/mcd"] == ("<=", 96.0)          # 1.60 x 60
    assert targets["val/stoi"] == (">=", 0.294)        # 0.42 x 0.70
    assert targets["val/f1_score"] == (">=", 0.72)     # 0.80 x 0.90
    assert targets["val/periodicity_loss"] == ("<=", 0.45)  # 1.5 x 0.30
    assert "ceiling" in derivation["val/mcd"]

    # end-to-end through the verdict: a run beating all derived targets and
    # holding voicing passes
    rows = []
    for m, series in {
        "val/mcd": [90.0, 80.0, 70.0],
        "val/stoi": [0.40, 0.50, 0.60],
        "val/f1_score": [0.70, 0.80, 0.80],
        "val/periodicity_loss": [0.50, 0.44, 0.40],
    }.items():
        for step, v in zip((250, 500, 1000), series):
            rows.append((step, m, v))
    _write_metrics(tmp_path, rows)
    audit = campaign.audit_metrics(tmp_path, disc_on_step=500, quality_targets=targets)
    ok, failures = campaign.quality_verdict(audit, quality_targets=targets)
    assert ok, failures
