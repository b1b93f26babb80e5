"""bench.py harness contract: the receipt must parse at every emission
point (round-4 lesson: a single end-of-run print + a harness timeout
produced an empty official artifact).  These tests pin the pieces that
guard that without running any Spark."""

from __future__ import annotations

import io
import json
import sys


def test_parse_pairs_spec():
    from bench import parse_pairs

    assert parse_pairs("1:4@30000x1,2:8@100000x2") == [
        (1, 4, 30000, 1), (2, 8, 100000, 2),
    ]
    # legacy form without a corpus/rep suffix
    assert parse_pairs("1:4,2:8") == [(1, 4, 30000, 2), (2, 8, 30000, 2)]
    # reps default to 2 when only a corpus is given
    assert parse_pairs("2:8@50000") == [(2, 8, 50000, 2)]


def test_emit_is_one_parseable_json_line(monkeypatch):
    import bench

    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.RESULT["queries"]["q1"] = 1.5
    bench.emit()
    bench.RESULT["queries"]["q2"] = 2.5
    bench.emit()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2
    # every line parses standalone; the LAST is the most complete
    parsed = [json.loads(ln) for ln in lines]
    assert parsed[0]["metric"] == "end_to_end_dedup_bench"
    assert "q2" not in parsed[0]["queries"] and "q2" in parsed[1]["queries"]
    assert all("elapsed_s" in p for p in parsed)


def test_budget_gating(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "BUDGET_S", 0)
    assert bench.budget_allows(10**9)      # 0 = unlimited
    monkeypatch.setattr(bench, "BUDGET_S", 100)
    monkeypatch.setattr(bench, "T_START", bench.time.time() - 50)
    assert bench.budget_allows(40)         # 50 elapsed + 40 <= 100
    assert not bench.budget_allows(60)     # 50 elapsed + 60 > 100
