"""Property-based differential test: the multi-field metric model against a
pure-Python reference (RFC 20240827:106-113 / :222-234 semantics).

For a random stream of (name, field, labels, ts, value, seq) samples:
- the metrics catalog holds exactly the distinct (metric, field) pairs;
- the data table dedups per (metric, series, FIELD, ts) by max seq — two
  fields of one series at one timestamp are two rows, never merged;
- field selection over the engine returns exactly the model's rows for
  that field, and the default field only sees 'value'-field samples.

Hypothesis drives the shape space (field collisions on one series/ts,
duplicate seqs resolved by value order stability is NOT assumed — seqs are
kept unique per example); one Spark round-trip per example is expensive, so
examples are bounded but collisions are forced by tight ranges."""

import pytest

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from horaedb_spark.metric.engine import MetricEngine

sample = st.tuples(
    st.sampled_from(["m1", "m2"]),              # metric (family) name
    st.sampled_from(["value", "sum", "count"]),  # field
    st.sampled_from(["a", "b"]),                 # one label value
    st.integers(min_value=0, max_value=3),       # ts bucket — forces collisions
    st.integers(min_value=-50, max_value=50),    # value
)
workload = st.lists(sample, min_size=1, max_size=12)



# second-tier property soak (pytest.ini round-15 tiering): the
# hypothesis-driven model differential is minutes-scale; run with -m slow
pytestmark = pytest.mark.slow

def _model(rows):
    """Pure-Python reference: last-writer (max seq) per
    (name, field, label, ts)."""
    best = {}
    for seq, (name, field, lab, ts, val) in enumerate(rows):
        key = (name, field, lab, ts)
        best[key] = (seq, float(val))
    return {k: v for k, (_s, v) in best.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload)
def test_multifield_engine_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            (name, {"host": lab}, ts * 1000, float(val), seq, field)
            for seq, (name, field, lab, ts, val) in enumerate(rows)
        ],
        "name string, labels map<string,string>, ts_ms long, value double, "
        "seq long, field string",
    )
    eng = MetricEngine(df)
    want = _model(rows)

    # catalog: exactly the distinct (metric, field) pairs
    got_cat = {
        (r["metric_name"], r["field_name"]) for r in eng.metrics.collect()
    }
    assert got_cat == {(n, f) for (n, f, _l, _t) in want}

    # per-field selection matches the model exactly
    for name in {n for (n, _f, _l, _t) in want}:
        for field in {f for (n2, f, _l, _t) in want if n2 == name}:
            sel = eng.select_series(name, field=field)
            got = {
                (r["series_key"], r["ts_ms"], r["value"])
                for r in sel.collect()
            }
            expect = {
                (f"host={lab}", ts * 1000, v)
                for (n2, f2, lab, ts), v in want.items()
                if n2 == name and f2 == field
            }
            assert got == expect, (name, field)
