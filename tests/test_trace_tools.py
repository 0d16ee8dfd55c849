"""tools/trace_breakdown.py on a synthetic trace (no TPU needed)."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_breakdown import breakdown  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_breakdown_groups_and_filters(tmp_path):
    ev = [
        # XLA Ops lane (pid 3 / tid 3): counted
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 10.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.2", "dur": 5.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy-done.7", "dur": 3.0},
        # the while wrapper is excluded (it spans its body)
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.3", "dur": 100.0},
        # other lanes are excluded
        {"ph": "X", "pid": 3, "tid": 9, "name": "fusion.9", "dur": 50.0},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.8", "dur": 50.0},
        # non-X phases are excluded
        {"ph": "M", "pid": 3, "tid": 3, "name": "fusion.5"},
    ]
    rows, total = breakdown(_write_trace(tmp_path, ev))
    assert total == 18.0
    assert rows[0] == (15.0, 2, "fusion")        # fusion.1 + fusion.2 merged
    assert rows[1] == (3.0, 1, "copy-done")

    rows_exact, total_exact = breakdown(_write_trace(tmp_path / "b", ev),
                                        exact=True)
    assert total_exact == 18.0
    assert {name for _, _, name in rows_exact} == {
        "fusion.1", "fusion.2", "copy-done.7"}
