"""Continuous-aggregate rollup with invalidation-based incremental refresh.

The reference engine stops at raw merge-on-read tables; dashboards at 100 TB
need the downsampled companion table. This module maintains one the way
published continuous-aggregate designs do (invalidation tracking + targeted
re-materialization), re-expressed on the ColumnarTable primitives:

1. **Invalidation discovery is metadata-only.** New raw SSTs since the last
   refresh are found by ``file_id > last_refresh_seq`` in the manifest; the
   union of their ``[start, end)`` time ranges — widened to bucket
   boundaries and merged into disjoint intervals — is the invalidated set.
   No raw data is read to decide what to refresh.
2. **Recompute only invalidated buckets.** Each interval is re-aggregated
   from the raw table through the normal merge-on-read scan (manifest
   time-range pruning keeps the scan proportional to the interval, not to
   history) and bulk-ingested into the rollup table, whose OVERWRITE
   primary key (group cols + bucket) replaces the stale bucket rows —
   later refreshes always win because ``bulk_ingest`` allocates
   monotonically increasing sequence ids.
3. **Late data is handled by construction.** A late row lands in an old raw
   segment as a new SST; that SST's time range flags the old bucket, which
   recomputes on the next refresh. Sequence decides, not arrival time —
   the same invariant the raw table's merge uses (SURVEY.md §7.3(d)).

Cost per refresh is proportional to raw data in invalidated buckets — never
to table history. A year-long table taking one hot day of writes rescans one
day (plus any genuinely late buckets), not 365.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from horaedb_spark.core.timeutil import TimeRange, truncate_by
from horaedb_spark.storage.table import ColumnarTable, ScanRequest


@dataclass
class RefreshStats:
    delta_ssts: int
    intervals: list[tuple[int, int]]
    refreshed_rows: int
    last_refresh_seq: int


def _merge_intervals(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Merge overlapping/adjacent [start, end) intervals into a disjoint,
    sorted list."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(ranges):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


class ContinuousRollup:
    """Maintains ``rollup`` as the bucketed aggregate of ``raw``.

    ``aggregate`` receives the (already time-filtered) raw scan and must
    return rows containing ``bucket_col`` (epoch-ms bucket start, a multiple
    of ``bucket_ms``) plus the rollup's other columns. It is re-run only
    over invalidated intervals, so it must be a pure function of its input
    rows — which any groupBy-aggregate is.
    """

    def __init__(
        self,
        raw: ColumnarTable,
        rollup: ColumnarTable,
        ts_col: str,
        bucket_col: str,
        bucket_ms: int,
        aggregate: Callable[[DataFrame], DataFrame],
    ) -> None:
        self.raw = raw
        self.rollup = rollup
        self.ts_col = ts_col
        self.bucket_col = bucket_col
        self.bucket_ms = bucket_ms
        self.aggregate = aggregate
        self._state_path = os.path.join(rollup.root, "_rollup_state.json")

    # -- state ---------------------------------------------------------------
    def last_refresh_seq(self) -> int:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return int(json.load(f)["last_refresh_seq"])
        return -1

    def _save_seq(self, seq: int) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_refresh_seq": seq}, f)
        os.replace(tmp, self._state_path)  # atomic: refresh state never torn

    # -- refresh -------------------------------------------------------------
    def invalidated_intervals(self) -> tuple[list[tuple[int, int]], int, int]:
        """(disjoint bucket-aligned intervals, delta SST count, max seq) for
        everything written since the last refresh — manifest metadata only."""
        last = self.last_refresh_seq()
        delta = [s for s in self.raw.manifest.find_ssts() if s.file_id > last]
        if not delta:
            return [], 0, last
        widened = [
            (
                truncate_by(s.time_range.start, self.bucket_ms),
                truncate_by(max(s.time_range.start, s.time_range.end - 1), self.bucket_ms)
                + self.bucket_ms,
            )
            for s in delta
        ]
        max_seq = max(s.file_id for s in delta)
        return _merge_intervals(widened), len(delta), max_seq

    def refresh(self) -> RefreshStats:
        intervals, n_delta, max_seq = self.invalidated_intervals()
        if not intervals:
            return RefreshStats(0, [], 0, self.last_refresh_seq())
        total_rows = 0
        for lo, hi in intervals:
            sliced = self.raw.scan(
                ScanRequest(time_range=TimeRange(lo, hi), ordered=False)
            ).filter((F.col(self.ts_col) >= lo) & (F.col(self.ts_col) < hi))
            out = self.aggregate(sliced)
            written = self.rollup.bulk_ingest(out, self.bucket_col)
            total_rows += sum(s.num_rows for s in written)
        self._save_seq(max_seq)
        return RefreshStats(n_delta, intervals, total_rows, max_seq)

    def serve(self, ordered: bool = False) -> DataFrame:
        return self.rollup.scan(ScanRequest(ordered=ordered))
