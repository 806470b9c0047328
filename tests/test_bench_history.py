"""bench.py regression detector — Spark-free replay tests.

Round-2 lesson: geo_knn drifted 1.30s -> 2.11s (+63%) across SEVERAL bench
runs; a detector comparing only to the immediately preceding entry reported
no regression at every step. The detector must compare against the best
comparable run in the full history.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import record_history


def _hist_line(sf, cpus, queries):
    return json.dumps({"ts": 0.0, "sf": sf, "cpus": cpus,
                       "value": sum(queries.values()), "queries": queries})


def test_creeping_drift_vs_best_is_flagged(tmp_path):
    # replay of the round-2 escape: 1.30 -> 1.55 -> 1.85 -> 2.11, every step
    # under the (>=30% and >=0.3s) band vs its predecessor
    path = tmp_path / "history.jsonl"
    path.write_text("\n".join(
        _hist_line(0.1, 32, {"geo_knn": t, "stable_q": 1.0})
        for t in (1.296, 1.55, 1.85)
    ) + "\n")
    out = {"sf": 0.1, "cpus": 32, "value": 3.11,
           "queries": {"geo_knn": 2.114, "stable_q": 1.05}}
    regs = record_history(out, path=str(path))
    assert "geo_knn" in regs
    assert regs["geo_knn"] == {"best": 1.296, "now": 2.114}
    assert "stable_q" not in regs
    # the run itself must be appended
    assert len(path.read_text().splitlines()) == 4


def test_other_sf_or_cpus_entries_are_ignored(tmp_path):
    path = tmp_path / "history.jsonl"
    path.write_text("\n".join([
        _hist_line(0.01, 32, {"q": 0.2}),   # different sf
        _hist_line(0.1, 8, {"q": 0.2}),     # different cpus
        _hist_line(0.1, 32, {"q": 1.0}),    # comparable
    ]) + "\n")
    out = {"sf": 0.1, "cpus": 32, "value": 1.1, "queries": {"q": 1.1}}
    assert record_history(out, path=str(path)) == {}


def test_noise_band_not_flagged(tmp_path):
    path = tmp_path / "history.jsonl"
    # +39% (the worst lucky-best noise excursion seen in the real history)
    # and an absolute delta under 0.4s: both below the calibrated band
    path.write_text(_hist_line(0.1, 32, {"a": 1.0, "b": 0.5}) + "\n")
    out = {"sf": 0.1, "cpus": 32, "value": 1.9,
           "queries": {"a": 1.39, "b": 0.85}}
    assert record_history(out, path=str(path)) == {}


def test_empty_history_no_regressions(tmp_path):
    path = tmp_path / "history.jsonl"
    out = {"sf": 0.1, "cpus": 32, "value": 1.0, "queries": {"a": 1.0}}
    assert record_history(out, path=str(path)) == {}
    assert path.exists()
