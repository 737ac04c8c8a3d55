import pytest
from pyspark.sql import types as T

from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.core.timeutil import TimeRange, segments_overlapping, truncate_by


# truncate_by — table-driven cases mirroring types.rs:246-302
@pytest.mark.parametrize(
    "ts,dur,expect",
    [
        (0, 100, 0),
        (99, 100, 0),
        (100, 100, 100),
        (250, 100, 200),
        (-1, 100, -100),
        (-100, 100, -100),
        (-101, 100, -200),
        (7_200_000 + 5, 7_200_000, 7_200_000),
    ],
)
def test_truncate_by(ts, dur, expect):
    assert truncate_by(ts, dur) == expect


def test_time_range_overlap():
    # types.rs:125-127 half-open semantics
    assert TimeRange(0, 10).overlaps(TimeRange(9, 20))
    assert not TimeRange(0, 10).overlaps(TimeRange(10, 20))
    assert TimeRange(5, 6).overlaps(TimeRange(0, 100))
    assert not TimeRange(0, 0).overlaps(TimeRange(0, 10))  # empty range


def test_time_range_segment_check():
    # storage.rs:309-316: a write range must not cross a segment boundary;
    # end is exclusive so [0, 100) with duration 100 is fine.
    assert TimeRange(0, 100).within_one_segment(100)
    assert TimeRange(1, 10).within_one_segment(100)
    assert not TimeRange(99, 101).within_one_segment(100)
    assert TimeRange(100, 200).within_one_segment(100)


def test_segments_overlapping():
    assert segments_overlapping(TimeRange(0, 100), 100) == [0]
    assert segments_overlapping(TimeRange(50, 250), 100) == [0, 100, 200]
    assert segments_overlapping(TimeRange(100, 100), 100) == []


def _schema(mode=UpdateMode.OVERWRITE):
    return StorageSchema(
        T.StructType(
            [
                T.StructField("pk1", T.LongType()),
                T.StructField("pk2", T.LongType()),
                T.StructField("value", T.LongType()),
            ]
        ),
        num_primary_keys=2,
        update_mode=mode,
    )


def test_schema_splits_pks_and_values():
    s = _schema()
    assert s.primary_keys == ("pk1", "pk2")
    assert s.value_fields == ("value",)
    phys = s.physical_schema()
    assert [f.name for f in phys.fields] == ["pk1", "pk2", "value", "__seq__", "__reserved__"]


def test_schema_rejects_builtin_collision():
    # types.rs:159-175
    with pytest.raises(ValueError):
        StorageSchema(
            T.StructType(
                [T.StructField("pk1", T.LongType()), T.StructField("__seq__", T.LongType())]
            ),
            num_primary_keys=1,
        )


def test_schema_append_requires_binary_values():
    with pytest.raises(ValueError):
        _schema(UpdateMode.APPEND)
    ok = StorageSchema(
        T.StructType(
            [T.StructField("pk1", T.LongType()), T.StructField("value", T.BinaryType())]
        ),
        num_primary_keys=1,
        update_mode=UpdateMode.APPEND,
    )
    assert ok.value_fields == ("value",)


def test_fill_required_projections():
    # types.rs:203-216: PKs + __seq__ force-included
    s = _schema()
    assert s.fill_required_projections(["value"]) == ["value", "pk1", "pk2", "__seq__"]
    assert s.fill_required_projections(None) is None


def test_resize_media_plumbing(spark):
    """resize_media executes the Arrow-batched contract with an injected
    resizer (deterministic fake: truncate/pad to w*h bytes) and raises
    cleanly without one."""
    import pytest as _pytest

    from horaedb_spark.functions.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, bytearray(b"xy"))],
        "media_id long, payload binary",
    )

    def fake_resizer(p: bytes, w: int, h: int) -> bytes:
        return (p * ((w * h) // max(len(p), 1) + 1))[: w * h]

    out = {
        r["media_id"]: (bytes(r["payload"]), r["width"], r["height"])
        for r in resize_media(df, "media_id", "payload", 2, 2, fake_resizer).collect()
    }
    assert out == {1: (b"abcd", 2, 2), 2: (b"xyxy", 2, 2)}

    with _pytest.raises(Exception, match="NotImplementedError|resize requires"):
        resize_media(df, "media_id", "payload", 2, 2).collect()
