"""Property-based differential test of Z-order clustered layout: for random
data and random conjunctive predicates, a clustered table must return
byte-identical rows to a plain one — layout can only change WHICH files are
read, never the answer. This is the invariant that makes recluster() safe to
run against live tables."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import types as T

from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.storage.table import ColumnarTable, ScanRequest

SEG = 1000

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),     # id (PK)
        st.integers(min_value=0, max_value=500),    # x
        st.integers(min_value=-200, max_value=200), # y
        st.integers(min_value=0, max_value=2999),   # ts: 3 segments
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)
bound = st.integers(min_value=-250, max_value=550)
predicate = st.one_of(
    st.tuples(st.just("x"), st.sampled_from([">=", "<", "="]), bound),
    st.tuples(st.just("y"), st.sampled_from([">=", "<", "="]), bound),
)


def _schema():
    return StorageSchema(
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("x", T.LongType()),
                T.StructField("y", T.LongType()),
                T.StructField("ts_ms", T.LongType()),
            ]
        ),
        num_primary_keys=1,
        update_mode=UpdateMode.OVERWRITE,
    )


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, preds=st.lists(predicate, min_size=1, max_size=2))
def test_clustered_scan_equals_plain_scan(spark, tmp_path_factory, data, preds):
    tmp = tmp_path_factory.mktemp("prop_z")
    df = spark.createDataFrame(data, "id long, x long, y long, ts_ms long")
    plain = ColumnarTable(spark, str(tmp / "p"), _schema(), SEG)
    clustered = ColumnarTable(spark, str(tmp / "z"), _schema(), SEG)
    plain.bulk_ingest(df, "ts_ms")
    clustered.bulk_ingest(df, "ts_ms", cluster_by=["x", "y"], cluster_slices=4)
    pred = " AND ".join(f"{c} {op} {v}" for c, op, v in preds)
    a = sorted(
        map(tuple, plain.scan(ScanRequest(predicate=pred, ordered=False)).collect())
    )
    b = sorted(
        map(
            tuple,
            clustered.scan(ScanRequest(predicate=pred, ordered=False)).collect(),
        )
    )
    assert a == b
