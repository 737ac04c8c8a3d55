"""Incremental continuous-rollup maintenance (storage/rollup.py): refreshes
must touch only invalidated buckets (discovered from manifest metadata), a
late write must re-materialize exactly its old bucket, and an idle refresh
must be a metadata-only no-op."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.rollup import ContinuousRollup, _merge_intervals
from horaedb_spark.storage.table import ColumnarTable, WriteRequest

DAY = 86_400_000


def _schema(pks, fields):
    return StorageSchema(
        T.StructType(fields), num_primary_keys=pks, update_mode=UpdateMode.OVERWRITE
    )


@pytest.fixture()
def tables(spark, tmp_path):
    raw = ColumnarTable(
        spark,
        str(tmp_path / "raw"),
        _schema(
            1,
            [
                T.StructField("id", T.LongType()),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("v", T.LongType()),
            ],
        ),
        segment_duration_ms=4 * DAY,
    )
    roll = ColumnarTable(
        spark,
        str(tmp_path / "roll"),
        _schema(
            1,
            [
                T.StructField("day_ms", T.LongType()),
                T.StructField("n", T.LongType()),
                T.StructField("sum_v", T.LongType()),
            ],
        ),
        segment_duration_ms=4 * DAY,
    )

    def daily(df):
        return df.groupBy(
            (F.col("ts_ms") - F.pmod("ts_ms", F.lit(DAY))).alias("day_ms")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sum_v"))

    return raw, roll, ContinuousRollup(raw, roll, "ts_ms", "day_ms", DAY, daily)


def _write(spark, raw, rows, lo, hi):
    df = spark.createDataFrame(rows, "id long, ts_ms long, v long")
    raw.write(WriteRequest(df, TimeRange(lo, hi)))


def test_refresh_then_late_write_recomputes_only_its_segment(spark, tables):
    """Invalidation granularity is the raw SEGMENT (4 days here): a late
    write to segment 0 recomputes segment 0's buckets and must NOT touch
    segment 1."""
    raw, roll, cr = tables
    # segment 0: days 0 and 1; segment 1: one row
    _write(spark, raw, [(1, 10, 5), (2, 20, 7)], 0, DAY)
    _write(spark, raw, [(3, DAY + 10, 11)], DAY, 2 * DAY)
    _write(spark, raw, [(9, 4 * DAY + 10, 99)], 4 * DAY, 5 * DAY)
    s1 = cr.refresh()
    assert s1.delta_ssts == 3
    assert s1.intervals == [(0, 8 * DAY)]  # both touched segments, merged
    served = {r["day_ms"]: (r["n"], r["sum_v"]) for r in cr.serve().collect()}
    assert served == {0: (2, 12), DAY: (1, 11), 4 * DAY: (1, 99)}

    # a LATE row lands back in segment 0 — segment 1 must not recompute
    _write(spark, raw, [(4, 30, 100)], 0, DAY)
    s2 = cr.refresh()
    assert s2.delta_ssts == 1
    assert s2.intervals == [(0, 4 * DAY)]
    served = {r["day_ms"]: (r["n"], r["sum_v"]) for r in cr.serve().collect()}
    assert served == {0: (3, 112), DAY: (1, 11), 4 * DAY: (1, 99)}


def test_pk_overwrite_moving_buckets_tombstones_old_bucket(spark, tables):
    """The hole the property test found: an OVERWRITE that moves a PK's
    timestamp to another bucket of the same segment must vacate the old
    bucket — served state equals a full rebuild, the stale row is
    tombstoned, not left behind."""
    raw, roll, cr = tables
    _write(spark, raw, [(1, 10, 5)], 0, DAY)
    cr.refresh()
    assert {r["day_ms"] for r in cr.serve().collect()} == {0}
    # same pk, new timestamp in day 1 (same 4-day segment): day 0 empties
    _write(spark, raw, [(1, DAY + 10, 5)], DAY, 2 * DAY)
    cr.refresh()
    served = {r["day_ms"]: (r["n"], r["sum_v"]) for r in cr.serve().collect()}
    assert served == {DAY: (1, 5)}


def test_idle_refresh_is_noop(spark, tables):
    raw, roll, cr = tables
    _write(spark, raw, [(1, 10, 5)], 0, DAY)
    assert cr.refresh().delta_ssts == 1
    s = cr.refresh()
    assert s.delta_ssts == 0 and s.intervals == [] and s.refreshed_rows == 0


def test_overwrite_in_raw_propagates_through_refresh(spark, tables):
    """Raw is an OVERWRITE table: re-writing PK id=1 with a new value must
    replace (not add) after the bucket recomputes — the rollup aggregates
    the MERGED raw view, not raw file contents."""
    raw, roll, cr = tables
    _write(spark, raw, [(1, 10, 5), (2, 20, 7)], 0, DAY)
    cr.refresh()
    _write(spark, raw, [(1, 10, 50)], 0, DAY)  # replaces id=1
    cr.refresh()
    served = {r["day_ms"]: (r["n"], r["sum_v"]) for r in cr.serve().collect()}
    assert served == {0: (2, 57)}


def test_merge_intervals():
    assert _merge_intervals([(2, 4), (0, 2), (6, 8)]) == [(0, 4), (6, 8)]
    assert _merge_intervals([(0, 3), (1, 2)]) == [(0, 3)]
    assert _merge_intervals([]) == []


def test_refresh_idempotent_after_lost_watermark(spark, tables):
    """Crash between bulk_ingest and the watermark save re-processes the
    same delta on the next refresh — the upsert path must make that
    idempotent (identical served state)."""
    import os

    raw, roll, cr = tables
    _write(spark, raw, [(1, 10, 5), (2, DAY + 20, 7)], 0, 2 * DAY)
    cr.refresh()
    before = sorted(map(tuple, cr.serve().collect()))
    os.remove(cr._state_path)  # simulate losing the watermark post-ingest
    s = cr.refresh()  # re-processes the same SSTs
    assert s.delta_ssts == 1
    assert sorted(map(tuple, cr.serve().collect())) == before


def test_refresh_after_raw_compaction_is_stable(spark, tables):
    """Compaction rewrites raw SSTs into one merged file with a HIGHER
    file_id, which the next refresh sees as new delta — the recompute must
    re-derive the identical rollup state (wasted work at most, never
    corruption), and a further refresh is a no-op."""
    from horaedb_spark.storage.compaction import Compactor, SchedulerConfig

    raw, roll, cr = tables
    _write(spark, raw, [(1, 10, 5), (2, 20, 7)], 0, DAY)
    _write(spark, raw, [(1, 10, 50)], 0, DAY)  # overwrite id=1
    cr.refresh()
    before = sorted(map(tuple, cr.serve().collect()))
    comp = Compactor(raw, SchedulerConfig(input_sst_min_num=2))
    assert comp.run_once() is not None  # 2 SSTs -> 1 merged SST, higher fid
    s = cr.refresh()  # compacted SST looks like delta
    assert s.delta_ssts == 1
    assert sorted(map(tuple, cr.serve().collect())) == before
    assert cr.refresh().delta_ssts == 0
