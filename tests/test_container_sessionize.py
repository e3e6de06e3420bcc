"""Container log parser + batch sessionization."""

from __future__ import annotations

import datetime

from beats_spark.operators.misc import container, sessionize


def test_container_auto_both_formats(spark):
    rows = [
        ('{"log":"hello from docker\\n","stream":"stdout","time":"2024-01-01T00:00:00.0Z"}',),
        ("2024-01-01T00:00:01.669794202Z stderr F cri says hi",),
    ]
    df = spark.createDataFrame(rows, "message string")
    out = {r.container.stream: r.container for r in container(df).collect()}
    assert out["stdout"].message == "hello from docker\n"
    assert out["stderr"].message == "cri says hi"
    assert out["stderr"].ts_raw.startswith("2024-01-01T00:00:01")


def test_sessionize_gap_boundaries(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        ("c1", 0, ts(0)), ("c1", 1, ts(5)), ("c1", 2, ts(200)),  # gap > 1h
        ("c1", 3, ts(205)),
        ("c2", 0, ts(0)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = sessionize(df, gap_seconds=3600)
    got = {(r.conv_id, r.session_seq): (r.n_events, r.first_idx, r.last_idx)
           for r in out.collect()}
    assert got == {
        ("c1", 1): (2, 0, 1),
        ("c1", 2): (2, 2, 3),
        ("c2", 1): (1, 0, 0),
    }
