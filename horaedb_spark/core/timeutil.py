"""Millisecond time model.

Mirrors the reference semantics (cited into /root/reference):
- timestamps are epoch *milliseconds* stored as i64
  (columnar_storage/src/types.rs:45-86; common/src/time_ext.rs:213);
- ``TimeRange`` is half-open ``[start, end)``
  (columnar_storage/src/types.rs:88-133; pb_types/protos/sst.proto:24-30);
- ``truncate_by`` floors a timestamp to a segment-duration boundary
  (columnar_storage/src/types.rs:82-85).

These are plain-Python metadata helpers; they never touch a Spark job. The
engine-side equivalent of ``truncate_by`` is the ``segment_expr`` column
expression below, which Catalyst folds into partition values at write time and
prunes on at read time.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_TS = 2**63 - 1
MIN_TS = -(2**63)


def truncate_by(ts_ms: int, duration_ms: int) -> int:
    """Floor ``ts_ms`` to a multiple of ``duration_ms``.

    Python's floor division already rounds toward negative infinity, which is
    the correct floor for negative timestamps (the Rust impl uses
    ``ts / d * d`` on non-negative values only).
    """
    if duration_ms <= 0:
        raise ValueError(f"segment duration must be positive, got {duration_ms}")
    return (ts_ms // duration_ms) * duration_ms


@dataclass(frozen=True, order=True)
class TimeRange:
    """Half-open ``[start, end)`` in epoch milliseconds."""

    start: int
    end: int

    def __post_init__(self) -> None:
        if self.end < self.start:
            raise ValueError(f"end < start in TimeRange({self.start}, {self.end})")

    @classmethod
    def all(cls) -> "TimeRange":
        return cls(MIN_TS, MAX_TS)

    def overlaps(self, other: "TimeRange") -> bool:
        # Mirrors types.rs:125-127: [a,b) overlaps [c,d) iff a < d and c < b.
        return self.start < other.end and other.start < self.end

    def contains(self, ts_ms: int) -> bool:
        return self.start <= ts_ms < self.end

    def within_one_segment(self, duration_ms: int) -> bool:
        """True iff the whole range falls inside one segment (storage.rs:309-316
        rejects writes that straddle a segment boundary; a range ending exactly
        on the next boundary is still inside because the end is exclusive)."""
        return truncate_by(self.start, duration_ms) == truncate_by(
            max(self.start, self.end - 1), duration_ms
        )

    def segment(self, duration_ms: int) -> int:
        return truncate_by(self.start, duration_ms)


def segments_overlapping(time_range: TimeRange, duration_ms: int) -> list[int]:
    """All segment start values whose ``[seg, seg+duration)`` overlaps the range.

    Used by the scan path for partition pruning: the resulting list becomes a
    ``WHERE __segment__ IN (...)`` predicate which Spark turns into directory
    pruning on a ``partitionBy("__segment__")`` table.
    """
    if time_range.start >= time_range.end:
        return []
    first = truncate_by(time_range.start, duration_ms)
    # Cap the enumeration: an unbounded scan just means "all segments"; callers
    # treat None-ish empty list via prune_all flag instead. We enumerate only
    # when the count is sane, else the caller should skip the IN-list.
    last = truncate_by(time_range.end - 1, duration_ms)
    n = (last - first) // duration_ms + 1
    if n > 100_000:
        raise OverflowError("time range spans too many segments to enumerate")
    return [first + i * duration_ms for i in range(int(n))]
