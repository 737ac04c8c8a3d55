"""Parser robustness fuzz: any input string either parses or raises the
library's own PromQLError — never an internal exception. The HTTP query
endpoints feed user-controlled strings straight into parse_promql, so an
IndexError/AttributeError escaping the parser is a 500 where Prometheus
returns a clean 400 (the wire-decoder fuzz in test_metric.py makes the
same guarantee for untrusted protobuf bytes)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from horaedb_spark.metric.promql import PromQLError, parse_promql

_ALPHABET = (
    string.ascii_letters
    + string.digits
    + '(){}[]<>=!~+-*/%^@:,."\' _'
    + "\t\n"
)


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=80))
def test_parser_never_crashes(s):
    try:
        parse_promql(s)
    except PromQLError:
        pass


# structured soup: concatenations of plausible PromQL fragments hit deeper
# parser states than uniform noise
_FRAGMENTS = [
    "sum", "rate", "by", "without", "on", "ignoring", "group_left",
    "group_right", "bool", "offset", "and", "or", "unless", "atan2",
    "(", ")", "[", "]", "{", "}", ",", "5m", "1d", ":", "@", "^",
    "metric", 'job="x"', "=~", "!~", "!=", "==", "<=", ">", "-", "+",
    "*", "/", "%", "0.5", "10", "time()", "vector", '"str"', "start()",
    "end()", "NaN", "Inf",
]


@settings(max_examples=500, deadline=None)
@given(st.lists(st.sampled_from(_FRAGMENTS), min_size=1, max_size=12))
def test_parser_never_crashes_on_fragment_soup(parts):
    try:
        parse_promql(" ".join(parts))
    except PromQLError:
        pass


def test_compile_fuzz_raises_only_promql_errors(spark):
    """Compile-level fuzz (parse + compile on a tiny engine, no action):
    fragment-soup strings must either build a plan or raise PromQLError —
    never an internal exception. This level found the (1/0) % 1 ValueError
    and the empty-call IndexErrors (clamp_min(), last_over_time()), all
    fixed; the seeded corpus keeps those classes pinned."""
    import random

    from pyspark.sql import functions as F

    from horaedb_spark.metric.engine import MetricEngine
    from horaedb_spark.metric.promql import promql_eval

    tiny = spark.range(60).select(
        F.when(F.col("id") % 3 == 0, "click").otherwise("error").alias("name"),
        F.create_map(
            F.lit("user"),
            (F.col("id") % 5).cast("string"),
            F.lit("cohort"),
            (F.col("id") % 2).cast("string"),
        ).alias("labels"),
        (F.col("id") * 3_600_000).alias("ts_ms"),
        F.col("id").cast("double").alias("value"),
        F.col("id").alias("seq"),
    )
    eng = MetricEngine(tiny)
    frags = [
        "sum", "avg", "stddev", "topk(2,", "quantile(0.5,", "limitk(1,",
        'count_values("l",', "rate(", "increase(", "deriv(", "changes(",
        "abs(", "sgn(", "clamp(", "clamp_min(", "round(",
        "histogram_quantile(0.5,", "histogram_fraction(1,2,", "absent(",
        "avg_over_time(", "last_over_time(", "timestamp(", "sort(",
        "label_replace(", "label_join(", "vector(", "scalar(", "time()",
        "pi()", "minute(", "click", "error", "click[1d]", "click[2d:1d]",
        '{cohort="1"}', "by (cohort)", "without (user)", "(", ")", "+",
        "-", "*", "/", "%", "^", "atan2", "and", "or", "unless",
        "on(cohort)", "ignoring(user)", "group_left", "group_right",
        "bool", ">", "==", "offset 1d", "offset -1d", "@ start()",
        "@ 3600", "0.5", "10", "-3", '"s"', ",", "[1d]", '{user=~"1|2"}',
        # multi-field selectors against a SINGLE-field engine: equality
        # form must surface PromQLError (the engine's ValueError is
        # wrapped at the string front-end), non-equality forms reject in
        # the compiler
        '{__field__="sum"}', '{__field__!="sum"}', '{__field__=~"s.*"}',
    ]
    rng = random.Random(20260815)
    for _ in range(300):
        q = " ".join(rng.choice(frags) for _ in range(rng.randint(1, 10)))
        try:
            promql_eval(eng, q, 86_400_000)  # build only — no action
        except PromQLError:
            pass
    # the exact falsifiers stay as named regressions
    for q in ("clamp_min( )", "last_over_time( )", "abs()"):
        try:
            promql_eval(eng, q, 86_400_000)
        except PromQLError:
            continue
        raise AssertionError(f"{q} should raise PromQLError")
    c = __import__(
        "horaedb_spark.metric.promql", fromlist=["PromQLCompiler"]
    ).PromQLCompiler(None, 60_000)
    from horaedb_spark.metric.promql import parse_promql

    assert str(c._eval(parse_promql("(1/0) % 1"))) == "nan"
    assert c._eval(parse_promql("5 % (1/0)")) == 5.0
