"""Independent-decoder equivalence for the remote-write codec.

The reference's strongest ingest test decodes real workloads with its custom
streaming parser and asserts field-exact equality against an INDEPENDENT
decoder (prost), sequentially and concurrently
(src/remote_write/tests/equivalence_test.rs:18-23,121-177). `google.protobuf`
is not importable in this environment, so the independent decoder here is a
second CLEAN-ROOM implementation written from the proto text
(src/pb_types/protos/remote_write.proto:21-77) in a deliberately different
style: a generic TABLE-DRIVEN wire walker with an explicit frame stack (the
primary in `metric/ingest.py` is a set of hand-specialized per-message
functions). An encode/decode pair that merely agreed with itself on a wrong
wire interpretation fails here, because the two decoders share no parsing
machinery.

Checked corpus: the structured Hypothesis fuzz set, adversarial hand-built
wire fixtures (unknown fields, unknown wire types, reserved field 2, nested
exemplars, zero-length strings, 10-byte maximal varints, duplicate scalar
fields, truncated payloads), and byte-mutation fuzz where the agreement
contract is "equal output or both reject".
"""

from __future__ import annotations

import struct

import pytest

from horaedb_spark.metric.ingest import (
    METRIC_TYPES,
    _ld,
    _varint,
    decode_exemplars,
    decode_metadata,
    decode_write_request,
    encode_write_request,
)

# --------------------------------------------------------------------------
# Clean-room table-driven decoder. Message schemas transcribed from
# remote_write.proto:21-77; nothing below imports from metric/ingest.

U64 = (1 << 64) - 1

# field number -> (attr name, kind[, sub-message]); every listed field is
# repeated iff attr ends with '[]'. Scalars follow proto3 last-wins.
SCHEMAS = {
    "WriteRequest": {
        1: ("timeseries[]", "msg", "TimeSeries"),
        3: ("metadata[]", "msg", "MetricMetadata"),
    },
    "TimeSeries": {
        1: ("labels[]", "msg", "Label"),
        2: ("samples[]", "msg", "Sample"),
        3: ("exemplars[]", "msg", "Exemplar"),
    },
    "Label": {1: ("name", "str"), 2: ("value", "str")},
    "Sample": {1: ("value", "f64"), 2: ("timestamp", "i64")},
    "Exemplar": {
        1: ("labels[]", "msg", "Label"),
        2: ("value", "f64"),
        3: ("timestamp", "i64"),
    },
    "MetricMetadata": {
        1: ("type", "u64"),
        2: ("metric_family_name", "str"),
        4: ("help", "str"),
        5: ("unit", "str"),
    },
}

_SCALAR_DEFAULT = {"str": "", "f64": 0.0, "i64": 0, "u64": 0}


def _blank(msg: str) -> dict:
    out = {}
    for attr, kind, *_ in SCHEMAS[msg].values():
        if attr.endswith("[]"):
            out[attr[:-2]] = []
        else:
            out[attr] = _SCALAR_DEFAULT[kind]
    return out


def _uvarint(view, pos: int, end: int) -> tuple[int, int]:
    val = 0
    for i in range(10):
        if pos >= end:
            raise ValueError("varint runs past buffer")
        byte = view[pos]
        pos += 1
        val |= (byte & 0x7F) << (7 * i)
        if byte < 0x80:
            return val & U64, pos
    raise ValueError("varint exceeds 10 bytes")


def pb_decode(msg: str, data: bytes) -> dict:
    """Generic stack-machine proto3 decoder over the SCHEMAS table."""
    view = memoryview(bytes(data))
    root = _blank(msg)
    # frame: [msg_type, pos, end, out_dict]
    stack = [[msg, 0, len(view), root]]
    while stack:
        frame = stack[-1]
        mtype, pos, end, out = frame
        if pos >= end:
            stack.pop()
            continue
        tag, pos = _uvarint(view, pos, end)
        fno, wire = tag >> 3, tag & 7
        spec = SCHEMAS[mtype].get(fno)
        expected_wire = None
        if spec is not None:
            kind = spec[1]
            expected_wire = {"msg": 2, "str": 2, "f64": 1, "i64": 0, "u64": 0}[kind]
        if spec is None or wire != expected_wire:
            # unknown field, or known field on the wrong wire type: skip
            if wire == 0:
                _, pos = _uvarint(view, pos, end)
            elif wire == 1:
                if pos + 8 > end:
                    raise ValueError("fixed64 runs past buffer")
                pos += 8
            elif wire == 2:
                ln, pos = _uvarint(view, pos, end)
                if pos + ln > end:
                    raise ValueError("length runs past buffer")
                pos += ln
            elif wire == 5:
                if pos + 4 > end:
                    raise ValueError("fixed32 runs past buffer")
                pos += 4
            else:
                raise ValueError(f"wire type {wire} unsupported")
            frame[1] = pos
            continue
        attr, kind = spec[0], spec[1]
        if kind == "msg":
            ln, pos = _uvarint(view, pos, end)
            if pos + ln > end:
                raise ValueError("length runs past buffer")
            child = _blank(spec[2])
            out[attr[:-2]].append(child)
            frame[1] = pos + ln
            stack.append([spec[2], pos, pos + ln, child])
            continue
        if kind == "str":
            ln, pos = _uvarint(view, pos, end)
            if pos + ln > end:
                raise ValueError("length runs past buffer")
            out[attr] = bytes(view[pos : pos + ln]).decode("utf-8")
            pos += ln
        elif kind == "f64":
            if pos + 8 > end:
                raise ValueError("double runs past buffer")
            out[attr] = struct.unpack_from("<d", view, pos)[0]
            pos += 8
        else:  # i64 / u64 varints
            raw, pos = _uvarint(view, pos, end)
            if kind == "i64" and raw >= 1 << 63:
                raw -= 1 << 64
            out[attr] = raw
        frame[1] = pos
    return root


# --------------------------------------------------------------------------
# Adapters: project the generic tree onto the primary decoders' outputs.


def ref_write_request(buf: bytes) -> list[dict]:
    out = []
    for ts in pb_decode("WriteRequest", buf)["timeseries"]:
        labels = {lb["name"]: lb["value"] for lb in ts["labels"]}
        name = labels.pop("__name__", "")
        for s in ts["samples"]:
            out.append(
                {
                    "name": name,
                    "labels": labels,
                    "ts_ms": s["timestamp"],
                    "value": s["value"],
                }
            )
    return out


def ref_exemplars(buf: bytes) -> list[dict]:
    out = []
    for ts in pb_decode("WriteRequest", buf)["timeseries"]:
        labels = {lb["name"]: lb["value"] for lb in ts["labels"]}
        name = labels.pop("__name__", "")
        for ex in ts["exemplars"]:
            out.append(
                {
                    "name": name,
                    "series_labels": labels,
                    "labels": {lb["name"]: lb["value"] for lb in ex["labels"]},
                    "value": ex["value"],
                    "ts_ms": ex["timestamp"],
                }
            )
    return out


def ref_metadata(buf: bytes) -> list[dict]:
    out = []
    for md in pb_decode("WriteRequest", buf)["metadata"]:
        t = md["type"]
        out.append(
            {
                "type": METRIC_TYPES[t] if t < len(METRIC_TYPES) else "UNKNOWN",
                "family_name": md["metric_family_name"],
                "help": md["help"],
                "unit": md["unit"],
            }
        )
    return out


def _eq_values(a, b) -> bool:
    """Field-exact equality that distinguishes NaN payload-insensitively
    (NaN == NaN for this purpose) but is otherwise plain equality."""
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq_values(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq_values(x, y) for x, y in zip(a, b))
    return a == b


def assert_decoders_agree(buf: bytes) -> None:
    """Both decoders accept with field-exact equal output, or both reject.

    Acceptance is judged on the FULL parse (samples + exemplars + metadata
    projections together), matching a whole-message prost parse: the
    primary's sample decoder deliberately length-skips exemplar bodies, so
    only the three projections combined visit every byte it claims to
    understand."""
    outcomes = []
    for fns in (
        (decode_write_request, decode_exemplars, decode_metadata),
        (ref_write_request, ref_exemplars, ref_metadata),
    ):
        try:
            outcomes.append(("ok", tuple(f(buf) for f in fns)))
        except Exception:
            outcomes.append(("err", None))
    (k1, v1), (k2, v2) = outcomes
    assert k1 == k2, f"primary={k1} independent={k2} on {buf!r}"
    if k1 == "ok":
        assert _eq_values(list(v1), list(v2)), (
            f"decode mismatch on {buf!r}:\n{v1}\n{v2}"
        )


# --------------------------------------------------------------------------
# Fixtures


def _series(n_series=3, n_samples=4, exemplars=True):
    out = []
    for i in range(n_series):
        s = {
            "name": f"metric_{i}",
            "labels": {"job": f"j{i}", "inst": f"host-{i}", "empty": ""},
            "samples": [
                (float(i) * 1.5 - k, 1_700_000_000_000 + 1000 * k - (i % 2))
                for k in range(n_samples)
            ],
        }
        if exemplars:
            s["exemplars"] = [
                {
                    "labels": {"trace_id": f"t{i}{k}"},
                    "value": 0.25 * k,
                    "ts_ms": -5 if k == 0 else 1_700_000_000_000 + k,
                }
                for k in range(2)
            ]
        out.append(s)
    return out


METADATA = [
    {"type": "COUNTER", "family_name": "metric_0", "help": "h", "unit": "s"},
    {"type": "STATESET", "family_name": "m", "help": "", "unit": ""},
]


def test_equivalence_on_structured_fixture():
    assert_decoders_agree(encode_write_request(_series(), METADATA))


def test_equivalence_empty_and_degenerate():
    assert_decoders_agree(b"")
    # series with no samples, no labels; empty-name metric
    assert_decoders_agree(encode_write_request([{"name": "", "labels": {}, "samples": []}]))
    assert_decoders_agree(_ld(1, b""))  # empty TimeSeries message


def test_equivalence_adversarial_wire_fixtures():
    base = encode_write_request(_series(1, 1))
    # unknown fields of every skippable wire type + reserved field 2
    noise = (
        _varint((9 << 3) | 0) + _varint(300)       # unknown varint
        + _varint((8 << 3) | 1) + b"\x01" * 8       # unknown fixed64
        + _ld(12, b"\xff\x00")                      # unknown length-delimited
        + _varint((7 << 3) | 5) + b"\x02" * 4       # unknown fixed32
        + _ld(2, b"\x08\x01")                       # reserved field 2
    )
    assert_decoders_agree(noise + base + noise)
    # duplicate scalar fields: proto3 last-wins for Sample.value/timestamp
    dup_sample = (
        _varint((1 << 3) | 1) + struct.pack("<d", 1.0)
        + _varint((1 << 3) | 1) + struct.pack("<d", 2.5)
        + _varint((2 << 3) | 0) + _varint(7)
        + _varint((2 << 3) | 0) + _varint(9)
    )
    ts = _ld(1, _ld(1, _ld(1, b"__name__") + _ld(2, b"m")) + _ld(2, dup_sample))
    assert_decoders_agree(ts)
    # duplicate label names across Label messages: last-wins in the dict
    ts2 = _ld(
        1,
        _ld(1, _ld(1, b"k") + _ld(2, b"v1"))
        + _ld(1, _ld(1, b"k") + _ld(2, b"v2"))
        + _ld(2, _varint((1 << 3) | 1) + struct.pack("<d", 3.0)),
    )
    assert_decoders_agree(ts2)


def test_equivalence_maximal_and_overlong_varints():
    # 10-byte maximal varint == 2^64-1 == int64 -1 (timestamp)
    max_varint = b"\xff" * 9 + b"\x01"
    sample = _varint((2 << 3) | 0) + max_varint
    buf = _ld(1, _ld(2, sample))
    assert_decoders_agree(buf)
    assert decode_write_request(buf)[0]["ts_ms"] == -1
    # 10th byte with EXTRA significant bits: low 64 bits only (C++/prost)
    sample2 = _varint((2 << 3) | 0) + (b"\xff" * 9 + b"\x7f")
    buf2 = _ld(1, _ld(2, sample2))
    assert_decoders_agree(buf2)
    assert decode_write_request(buf2)[0]["ts_ms"] == -1
    # 11-byte varint: invalid everywhere — both must reject
    sample3 = _varint((2 << 3) | 0) + (b"\xff" * 10 + b"\x01")
    assert_decoders_agree(_ld(1, _ld(2, sample3)))
    with pytest.raises(ValueError):
        decode_write_request(_ld(1, _ld(2, sample3)))


def test_equivalence_truncation_rejected():
    """A declared length past the buffer end is malformed; silently
    truncating field content would hand wrong data to ingest."""
    good = encode_write_request(_series(1, 2))
    for cut in (1, 5, len(good) // 2, len(good) - 1):
        assert_decoders_agree(good[:cut])
    # explicit oversized length claim on a label value
    bad = _ld(1, _ld(1, _ld(1, b"k") + _varint((2 << 3) | 2) + _varint(200) + b"xy"))
    assert_decoders_agree(bad)
    with pytest.raises(ValueError):
        decode_write_request(bad)


def test_equivalence_unknown_enum_and_groups():
    # out-of-range enum value -> UNKNOWN in both adapters
    md = _ld(3, _varint((1 << 3) | 0) + _varint(250))
    assert_decoders_agree(md)
    assert decode_metadata(md)[0]["type"] == "UNKNOWN"
    # deprecated group wire types (3/4) are unsupported: both reject
    assert_decoders_agree(_varint((5 << 3) | 3))
    assert_decoders_agree(_varint((5 << 3) | 4))


def test_equivalence_hypothesis_fuzz():
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    series = st.lists(
        st.fixed_dictionaries(
            {
                "name": st.text(max_size=10),
                "labels": st.dictionaries(
                    st.text(min_size=1, max_size=6), st.text(max_size=8), max_size=3
                ),
                "samples": st.lists(
                    st.tuples(
                        st.floats(allow_nan=True, allow_infinity=True, width=64),
                        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
                    ),
                    max_size=4,
                ),
            }
        ),
        max_size=4,
    )

    @settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(series, st.binary(max_size=24), st.integers(0, 255), st.integers(0, 1))
    def check(ser, tail, mut_byte, mutate):
        buf = encode_write_request(ser)
        assert_decoders_agree(buf)
        # byte-mutation fuzz: flip one byte / append junk; both decoders
        # must agree on accept-with-equal-output or reject
        if mutate and buf:
            i = mut_byte % len(buf)
            assert_decoders_agree(buf[:i] + bytes([mut_byte]) + buf[i + 1 :])
        assert_decoders_agree(buf + tail)

    check()


def test_equivalence_sequential_and_concurrent_soak():
    """The reference shape: 50 sequential + 50 concurrent decodes of the
    same workloads, every one field-exact equal across decoders
    (equivalence_test.rs:121-177)."""
    from concurrent.futures import ThreadPoolExecutor

    payloads = [
        encode_write_request(_series(1 + i % 4, 1 + i % 5), METADATA if i % 2 else None)
        for i in range(50)
    ]
    for p in payloads:
        assert_decoders_agree(p)
    with ThreadPoolExecutor(8) as pool:
        list(pool.map(assert_decoders_agree, payloads))
