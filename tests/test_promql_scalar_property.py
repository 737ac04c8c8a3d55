"""Property test: the PromQL parser's precedence/associativity against an
independent reference evaluator, over randomly generated scalar arithmetic
expressions RENDERED WITHOUT redundant parentheses — so a precedence bug in
the grammar (term/unary/power ladder, ^ right-associativity, unary-minus-
binds-looser-than-^) cannot hide. Pure driver-side: no SparkSession."""

import math

import hypothesis.strategies as st
from hypothesis import given, settings

from horaedb_spark.metric.promql import PromQLCompiler, parse_promql

# precedence levels used by the renderer (matches the Prometheus grammar)
_LEVEL = {"+": 1, "-": 1, "*": 2, "/": 2, "%": 2, "neg": 3, "^": 4}


def _ref_eval(node) -> float:
    """Independent Go-semantics evaluator over the test's own AST tuples."""
    if isinstance(node, float):
        return node
    op, *args = node
    if op == "neg":
        return -_ref_eval(args[0])
    a, b = _ref_eval(args[0]), _ref_eval(args[1])
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0:
            return float("inf") if a > 0 else float("-inf") if a < 0 else float("nan")
        return a / b
    if op == "%":
        # Go math.Mod: NaN for a zero divisor, an infinite dividend, or
        # NaN on either side (math.fmod raises on an infinite dividend)
        if b == 0 or math.isinf(a) or math.isnan(a) or math.isnan(b):
            return float("nan")
        return math.fmod(a, b)
    if op == "^":
        try:
            return math.pow(a, b)
        except OverflowError:
            neg = a < 0 and b == int(b) and int(b) % 2 == 1
            return float("-inf") if neg else float("inf")
        except ValueError:
            return float("inf") if (a == 0 and b < 0) else float("nan")
    raise AssertionError(op)


def _render(node, min_level: int = 0) -> str:
    """Precedence-aware rendering with the FEWEST parens that preserve the
    tree — the point of the test: the string round-trips through the real
    parser only if its precedence ladder matches the reference grammar."""
    if isinstance(node, float):
        s = repr(node)
        return s
    op, *args = node
    lvl = _LEVEL[op]
    if op == "neg":
        inner = _render(args[0], lvl + 1)  # - binds looser than ^ only
        # ^ must NOT be swallowed: -(2^2) != (-2)^2 — but our level for
        # the child of neg is neg+1=4, and ^ nodes are level 4, so a ^
        # child renders unparenthesized: -2^2 == -(2^2) in the grammar.
        s = f"-{inner}"
    elif op == "^":
        # right-associative: the LEFT child needs a strictly higher level
        s = f"{_render(args[0], lvl + 1)} ^ {_render(args[1], lvl)}"
    else:
        # left-associative: the RIGHT child needs a strictly higher level
        s = f"{_render(args[0], lvl)} {op} {_render(args[1], lvl + 1)}"
    if lvl < min_level:
        s = f"({s})"
    return s


_leaf = st.sampled_from([0.0, 1.0, 2.0, 3.0, 0.5, 7.0, 10.0])
_expr = st.recursive(
    _leaf,
    lambda kids: st.one_of(
        st.tuples(st.sampled_from(["+", "-", "*", "/", "%", "^"]), kids, kids),
        st.tuples(st.just("neg"), kids),
    ),
    max_leaves=12,
)


def _same(a: float, b: float) -> bool:
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if math.isinf(a) or math.isinf(b):
        return a == b
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=300, deadline=None)
@given(_expr)
def test_scalar_precedence_round_trip(tree):
    text = _render(tree)
    want = _ref_eval(tree)
    got = PromQLCompiler(None, 1000)._eval(parse_promql(text))
    assert isinstance(got, float), (text, got)
    assert _same(got, want), (text, got, want)


def test_power_and_unary_goldens():
    """The cases the ladder exists for, pinned explicitly."""
    c = PromQLCompiler(None, 1000)
    for text, want in [
        ("-2^2", -4.0),          # unary binds looser than ^
        ("2^-3", 0.125),         # unary allowed on the rhs of ^
        ("2^3^2", 512.0),        # right-associative
        ("(2^3)^2", 64.0),
        ("2 * 3 ^ 2", 18.0),     # ^ above *
        ("1 - 2 - 3", -4.0),     # left-associative sum
        ("8 / 4 / 2", 1.0),      # left-associative term
        ("1 / 0", float("inf")),
        ("-1 / 0", float("-inf")),
        ("7 % 0", float("nan")),
        ("0 ^ -1", float("inf")),
    ]:
        got = c._eval(parse_promql(text))
        assert _same(got, want), (text, got, want)
