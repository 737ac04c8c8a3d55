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
