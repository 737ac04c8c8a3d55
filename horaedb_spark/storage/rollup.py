"""Continuous-aggregate rollup with invalidation-based incremental refresh.

The reference engine stops at raw merge-on-read tables; dashboards at 100 TB
need the downsampled companion table. This module maintains one the way
published continuous-aggregate designs do (invalidation tracking + targeted
re-materialization), re-expressed on the ColumnarTable primitives:

1. **Invalidation discovery is metadata-only.** New raw SSTs since the last
   refresh are found by ``file_id > last_refresh_seq`` in the manifest; the
   union of their ``[start, end)`` time ranges — widened to full SEGMENT
   boundaries (then bucket-aligned) and merged into disjoint intervals —
   is the invalidated set. No raw data is read to decide what to refresh.
   Segment (not bucket) granularity is what makes OVERWRITE raw tables
   correct: the merge contract is latest-per-(segment, PK), so a new SST
   can replace a row anywhere in ITS segment — including moving the row's
   timestamp to a different bucket and vacating the old one — but can
   never disturb a segment it doesn't touch.
2. **Recompute only invalidated intervals.** Each interval is re-aggregated
   from the raw table through the normal merge-on-read scan (manifest
   time-range pruning keeps the scan proportional to the interval, not to
   history) and bulk-ingested into the rollup table, whose OVERWRITE
   primary key (group cols + bucket) replaces the stale bucket rows —
   later refreshes always win because ``bulk_ingest`` allocates
   monotonically increasing sequence ids. A (group, bucket) that existed
   before but has NO surviving raw rows gets an explicit zero-count
   TOMBSTONE row (the upsert path can't delete); ``serve()`` filters
   ``count_col > 0``.
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
        count_col: str = "n",
    ) -> None:
        self.raw = raw
        self.rollup = rollup
        self.ts_col = ts_col
        self.bucket_col = bucket_col
        self.bucket_ms = bucket_ms
        self.aggregate = aggregate
        # the aggregate's row-count column: must be > 0 for any bucket with
        # data — tombstones set it to 0, serve() filters on it
        self.count_col = count_col
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
        """(disjoint intervals, delta SST count, max seq) for everything
        written since the last refresh — manifest metadata only. Intervals
        are widened to full raw SEGMENTS (a new SST can overwrite any row of
        its segment, moving it between buckets), then bucket-aligned."""
        last = self.last_refresh_seq()
        delta = [s for s in self.raw.manifest.find_ssts() if s.file_id > last]
        if not delta:
            return [], 0, last
        seg = self.raw.segment_duration_ms

        def widen(start: int, end: int) -> tuple[int, int]:
            lo = truncate_by(start, seg)
            hi = truncate_by(max(start, end - 1), seg) + seg
            lo = truncate_by(lo, self.bucket_ms)
            hi = truncate_by(hi - 1, self.bucket_ms) + self.bucket_ms
            return lo, hi

        widened = [widen(s.time_range.start, s.time_range.end) for s in delta]
        max_seq = max(s.file_id for s in delta)
        return _merge_intervals(widened), len(delta), max_seq

    def _tombstones(self, interval_out: DataFrame, lo: int, hi: int) -> DataFrame:
        """Zero-count rows for (group, bucket) PKs that were materialized in
        [lo, hi) but have no surviving raw rows — the upsert path can't
        delete, so vacated buckets are overwritten with count 0."""
        pks = self.rollup.schema.primary_keys
        prev = self.rollup.scan(
            ScanRequest(
                predicate=f"{self.bucket_col} >= {lo} AND {self.bucket_col} < {hi}",
                ordered=False,
            )
        ).filter(F.col(self.count_col) > 0)
        vacated = prev.select(*pks).exceptAll(interval_out.select(*pks))
        zeros = [
            F.lit(0).cast(f.dataType).alias(f.name)
            for f in self.rollup.schema.fields.fields
            if f.name not in pks
        ]
        return vacated.select(*pks, *zeros).select(
            *[f.name for f in self.rollup.schema.fields.fields]
        )

    def refresh(self) -> RefreshStats:
        intervals, n_delta, max_seq = self.invalidated_intervals()
        if not intervals:
            return RefreshStats(0, [], 0, self.last_refresh_seq())
        total_rows = 0
        for lo, hi in intervals:
            sliced = self.raw.scan(
                ScanRequest(time_range=TimeRange(lo, hi), ordered=False)
            ).filter((F.col(self.ts_col) >= lo) & (F.col(self.ts_col) < hi))
            out = self.aggregate(sliced).persist()
            upsert = out.unionByName(self._tombstones(out, lo, hi))
            written = self.rollup.bulk_ingest(upsert, self.bucket_col)
            total_rows += sum(s.num_rows for s in written)
            out.unpersist()
        self._save_seq(max_seq)
        return RefreshStats(n_delta, intervals, total_rows, max_seq)

    def serve(self, ordered: bool = False) -> DataFrame:
        return self.rollup.scan(ScanRequest(ordered=ordered)).filter(
            F.col(self.count_col) > 0
        )
