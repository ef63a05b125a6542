"""Temporal operators (ops/relational.py) on hand-built event tables —
edge cases the generated corpus never produces."""
import datetime

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    t0 = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            (eid, t0 + datetime.timedelta(seconds=s), uid, etype, value)
            for eid, s, uid, etype, value in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_asof_null_valued_view_does_not_decouple_id_and_value(
    spark, tmp_path
):
    # view A (value 1.5) then view B (value NULL) then a click: the
    # as-of match is B as a UNIT — id B, value NULL. Two independent
    # last(ignorenulls) scans would answer (B, 1.5), attributing A's
    # value to B; the struct-carry makes that impossible.
    from pdfi_spark.ops import asof_join_events

    sf = _write_events(spark, tmp_path, [
        (1, 0, 7, "view", 1.5),
        (2, 10, 7, "view", None),
        (3, 20, 7, "click", 0.0),
        (4, 30, 8, "click", 0.0),  # user with no views at all
    ])
    rows = {r["click_id"]: r for r in asof_join_events(spark, sf).collect()}
    assert rows[3]["asof_view_id"] == 2
    assert rows[3]["asof_view_value"] is None
    assert rows[4]["asof_view_id"] is None


def test_range_join_prefilter_keeps_counts_exact(spark, tmp_path):
    # non-click/error types are filtered before the window; counts for
    # error rows must be identical to the unfiltered semantics
    from pdfi_spark.ops import range_join_counts

    sf = _write_events(spark, tmp_path, [
        (1, 0, 7, "click", 0.0),
        (2, 50, 7, "purchase", 9.0),   # inside the window, must not count
        (3, 100, 7, "error", 0.0),     # clicks within +-120s: events 1, 5
        (4, 300, 7, "click", 0.0),     # outside the window
        (5, 150, 7, "click", 0.0),
        (6, 100, 8, "error", 0.0),     # other user: no clicks
    ])
    rows = {r["error_id"]: r["clicks_near"]
            for r in range_join_counts(spark, sf).collect()}
    assert rows == {3: 2, 6: 0}
