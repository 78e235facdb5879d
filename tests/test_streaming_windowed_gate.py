"""streaming_windowed_triples — the watermarked windowed aggregation under
the driver gate: late rows are dropped by the WATERMARK (not by the twin's
construction), pinned by comparing against a drop-free batch replay."""

import collections

import duckdb


def test_streaming_windowed_gate_matches_oracle(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    df = E.queries()["streaming_windowed_triples"](spark, sf)
    got = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = set(
        map(tuple, con.sql(E.oracle_sql()["streaming_windowed_triples"]).fetchall())
    )
    assert got == exp
    assert df.columns == ["w_start", "w_end", "subj", "obj", "cnt"]


def test_watermark_actually_dropped_late_rows(spark):
    """If the watermark had NOT dropped the late rows, the emitted counts
    would equal a plain batch window-count over every scheduled row (minus
    only the never-closed final windows). Assert they differ, and differ
    exactly ON the late_dropped rows' windows — the drop is attributable
    to the watermark, row for row."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    df = E.queries()["streaming_windowed_triples"](spark, sf)
    got = {(r.w_start, r.w_end, r.subj, r.obj): r.cnt for r in df.collect()}

    import datetime as dt

    plan = E._sw_schedule(60)
    base = dt.datetime.fromisoformat(E._SW_BASE_TS)
    no_drop = collections.Counter()
    dropped_windows = set()
    final_wm = 600 * 3 + 530
    for i, b, m, role, d, s in plan:
        ws, we = (m // 60) * 60, (m // 60) * 60 + 60
        if we > final_wm:
            continue  # never-closed windows are held in state either way
        key = (base + dt.timedelta(minutes=ws), base + dt.timedelta(minutes=we), d, s)
        no_drop[key] += 1
        if role == "late_dropped":
            dropped_windows.add(key)
    assert dropped_windows  # the schedule really contains provable drops
    assert got != dict(no_drop)
    diff = {k for k in set(got) | set(no_drop) if got.get(k) != no_drop.get(k)}
    # every discrepancy is a window that received a late_dropped row
    assert diff and diff <= dropped_windows, (diff, dropped_windows)
