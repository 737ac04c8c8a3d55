"""Property-based differential test of incremental rollup maintenance: a
random interleaving of raw writes (including late, overlapping, and
PK-overwriting ones) and refreshes must leave the served rollup equal to a
pure-Python full rebuild over the merged raw state — the invariant that
makes incremental maintenance trustworthy at any scale.

One Spark round-trip per example is expensive; examples are bounded but the
shape space (late arrivals, intra-day PK overwrites, refresh-at-any-point)
is the part that matters.
"""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F
from pyspark.sql import types as T

from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.storage.rollup import ContinuousRollup
from horaedb_spark.storage.table import ColumnarTable

DAY = 100  # small "day" bucket; segment = 2 days
SEG = 2 * DAY

# (pk, ts, value): tight pk/ts ranges force overwrites and late arrivals
row = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=399),  # spans 4 days / 2 segments
    st.integers(min_value=-50, max_value=50),
)
step = st.one_of(
    st.tuples(st.just("write"), st.lists(row, min_size=1, max_size=4,
                                         unique_by=lambda r: r[0])),
    st.tuples(st.just("refresh"), st.none()),
)
workload = st.lists(step, min_size=2, max_size=6)


def _model_rollup(writes):
    """Merged raw state under the ENGINE's semantics — latest write wins per
    (segment, pk), the documented PK-uniqueness-within-segment contract —
    then per-day (n, sum) over surviving rows."""
    state = {}
    for seq, rows in enumerate(writes):
        for pk, ts, v in rows:
            seg = ts - ts % SEG
            state[(seg, pk)] = (seq, ts, v)
    agg = {}
    for (_seg, _pk), (_seq, ts, v) in state.items():
        day = ts - ts % DAY
        n, s = agg.get(day, (0, 0))
        agg[day] = (n + 1, s + v)
    return dict(agg)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload=workload)
def test_incremental_refresh_equals_full_rebuild(spark, tmp_path_factory, workload):
    tmp = tmp_path_factory.mktemp("prop_rollup")
    raw = ColumnarTable(
        spark,
        str(tmp / "raw"),
        StorageSchema(
            T.StructType(
                [
                    T.StructField("pk", T.LongType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("v", T.LongType()),
                ]
            ),
            num_primary_keys=1,
            update_mode=UpdateMode.OVERWRITE,
        ),
        SEG,
    )
    roll = ColumnarTable(
        spark,
        str(tmp / "roll"),
        StorageSchema(
            T.StructType(
                [
                    T.StructField("day_ms", T.LongType()),
                    T.StructField("n", T.LongType()),
                    T.StructField("sum_v", T.LongType()),
                ]
            ),
            num_primary_keys=1,
            update_mode=UpdateMode.OVERWRITE,
        ),
        SEG,
    )

    def daily(df):
        return df.groupBy(
            (F.col("ts_ms") - F.pmod("ts_ms", F.lit(DAY))).alias("day_ms")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sum_v"))

    cr = ContinuousRollup(raw, roll, "ts_ms", "day_ms", DAY, daily)
    writes = []
    for op, payload in workload:
        if op == "write":
            writes.append(payload)
            df = spark.createDataFrame(payload, "pk long, ts_ms long, v long")
            # a write may span segments: route through bulk_ingest, which
            # splits by segment (the single-segment write() would reject)
            raw.bulk_ingest(df, "ts_ms")
        else:
            cr.refresh()
    cr.refresh()  # final catch-up
    got = {
        r["day_ms"]: (r["n"], r["sum_v"]) for r in cr.serve().collect()
    }
    # empty days disappear from the raw scan but a bucket that ONCE had rows
    # keeps its last materialization only if it still has rows; with
    # OVERWRITE raw semantics rows never vanish, so domains must match.
    assert got == _model_rollup(writes)
