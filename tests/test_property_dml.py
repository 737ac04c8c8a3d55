"""Property-based differential test for the DML surface: random sequences
of write / update / delete / merge_into against a pure-Python model of the
versioning semantics (per (segment, PK): newest version wins; tombstone
winners vanish; update touches only current matching rows; merge upserts,
conditionally deletes, and inserts).

One Spark table per example is expensive, so examples are few but the op
space (DML interleavings over colliding keys and two segments) is the part
that matters — every resurrect/ordering bug found by hand in development
lives in exactly this space."""

import pytest

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.table import ColumnarTable, WriteRequest
from tests.test_storage import kv_schema

SEG = 7_200_000  # TWO_HOURS — all test rows land in segment 0 or 1

key = st.tuples(
    st.integers(min_value=0, max_value=2),  # pk1
    st.integers(min_value=0, max_value=1),  # pk2
)
seg_idx = st.integers(min_value=0, max_value=1)

write_op = st.tuples(
    st.just("write"),
    seg_idx,
    st.lists(
        st.tuples(key, st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=4,
        unique_by=lambda r: r[0],
    ),
)
update_op = st.tuples(st.just("update"), st.integers(min_value=-50, max_value=50))
delete_op = st.tuples(st.just("delete"), st.integers(min_value=-50, max_value=50))
merge_op = st.tuples(
    st.just("merge"),
    seg_idx,
    st.lists(
        st.tuples(key, st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=3,
        unique_by=lambda r: r[0],
    ),
    st.integers(min_value=-50, max_value=50),  # delete threshold
)
workload = st.lists(
    st.one_of(write_op, update_op, delete_op, merge_op), min_size=1, max_size=5
)



# second-tier property soak (pytest.ini round-15 tiering): the
# hypothesis-driven model differential is minutes-scale; run with -m slow
pytestmark = pytest.mark.slow

def model_apply(ops):
    """state[(seg, pk1, pk2)] = value or absent (deleted)."""
    state: dict = {}
    for op in ops:
        kind = op[0]
        if kind == "write":
            _, si, rows = op
            for (pk1, pk2), v in rows:
                state[(si, pk1, pk2)] = v
        elif kind == "update":
            _, delta = op
            for k, v in list(state.items()):
                if v >= 10:  # predicate: value >= 10
                    state[k] = v + delta
        elif kind == "delete":
            _, thresh = op
            for k, v in list(state.items()):
                if v < thresh:
                    del state[k]
        else:  # merge: upsert rows; matched rows with current value < thresh delete
            _, si, rows, thresh = op
            for (pk1, pk2), v in rows:
                cur = state.get((si, pk1, pk2))
                if cur is not None and cur < thresh:
                    del state[(si, pk1, pk2)]
                else:
                    state[(si, pk1, pk2)] = v
    return sorted((si, pk1, pk2, v) for (si, pk1, pk2), v in state.items())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(workload)
def test_dml_sequence_matches_model(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("dmlprop")
    t = ColumnarTable(spark, str(root / "t"), kv_schema(), SEG)
    mk = lambda rows: spark.createDataFrame(rows, "pk1 long, pk2 long, value long")
    for op in ops:
        kind = op[0]
        if kind == "write":
            _, si, rows = op
            df = mk([(pk1, pk2, v) for (pk1, pk2), v in rows])
            t.write(WriteRequest(df, TimeRange(si * SEG, si * SEG + 1)))
        elif kind == "update":
            _, delta = op
            t.update("value >= 10", {"value": f"value + ({delta})"})
        elif kind == "delete":
            _, thresh = op
            t.delete(f"value < {thresh}")
        else:
            _, si, rows, thresh = op
            src = spark.createDataFrame(
                [(pk1, pk2, v, si * SEG) for (pk1, pk2), v in rows],
                "pk1 long, pk2 long, value long, ts long",
            )
            t.merge_into(src, "ts", when_matched_delete=f"cur_value < {thresh}")
    # compare segment-aware: the merged view keyed (segment, PK) is the
    # engine's true state space (scan() drops the segment column)
    from horaedb_spark.storage.merge import apply_update_mode

    ssts = t.manifest.all_ssts()
    if not ssts:  # a DML-only workload over an empty table writes nothing
        assert model_apply(ops) == []
        return
    df = t._read_ssts(ssts)
    merged = apply_update_mode(
        df, t.schema, extra_key_cols=["__segment__"], keep_builtin=False
    )
    eng = sorted(
        (int(r["__segment__"]) // SEG, r["pk1"], r["pk2"], r["value"])
        for r in merged.select("__segment__", "pk1", "pk2", "value").collect()
    )
    assert eng == model_apply(ops)
