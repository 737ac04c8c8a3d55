"""Structured Streaming ingest into a ColumnarTable (SURVEY.md §3.2).

The reference's ingest path is: validate the batch's time range stays in one
segment, sort by PK, stamp ``__seq__``, write one SST, append to the manifest
(columnar_storage/src/storage.rs:307-333). Streaming-side, the Spark-native
equivalent is a ``foreachBatch`` sink: each micro-batch is split by segment
(a batch MAY span segments — the split restores the one-segment-per-SST
invariant rather than rejecting, since a stream can't retry), each slice is
pre-collapsed to one version per PK (deterministically, by a caller-supplied
ordering), and written as one SST whose ``__seq__`` is the allocated file id.

Late data needs no watermark machinery: a late row lands in its (old)
segment as a new SST and merge-on-read resolves versions by ``__seq__`` —
exactly the reference's behavior (sequence decides, not arrival time;
SURVEY.md §7.3(d)).

Exactly-once: foreachBatch can replay a batch on failure. A replayed write
creates a new SST with the same logical rows; merge-on-read makes the replay
idempotent for Overwrite tables (the newer seq wins with equal content).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.table import ColumnarTable, WriteRequest


def write_batch_segmented(
    table: ColumnarTable,
    batch: DataFrame,
    ts_col: str,
    pre_dedup: Callable[[DataFrame], DataFrame] | None = None,
) -> int:
    """Split one (micro-)batch by segment and write each slice as one SST.
    Returns the number of SSTs written.

    Segment enumeration is ONE partial-aggregated ``collect_set`` (a
    metadata-sized result — segments present in a micro-batch are few), not
    a ``distinct()`` of the data. The common case — every row in one
    segment — then writes directly with no persist and no slice filters:
    one enumeration pass + one write pass total. Only a genuinely
    multi-segment batch (late data) is persisted so each per-segment slice
    write reads cached blocks. ``pre_dedup`` runs per segment slice, never
    across segments: an SST covers its segment, and collapsing versions
    across segments would change time-range scan results. Segment
    derivation uses the floor form — ``div`` truncates toward zero, which
    would map a pre-epoch row into segment 0 and then silently drop it at
    the slice filter."""
    dur = table.segment_duration_ms
    seg_col = F.col(ts_col) - F.pmod(ts_col, F.lit(dur))
    segs = sorted(batch.agg(F.collect_set(seg_col.alias("seg"))).first()[0])
    if not segs:
        return 0
    if len(segs) == 1:
        sl = pre_dedup(batch) if pre_dedup is not None else batch
        table.write(WriteRequest(sl, TimeRange(segs[0], segs[0] + dur)))
        return 1
    batch = batch.persist()
    try:
        n = 0
        for seg in segs:
            sl = batch.filter(
                (F.col(ts_col) >= seg) & (F.col(ts_col) < seg + dur)
            )
            if pre_dedup is not None:
                sl = pre_dedup(sl)
            table.write(WriteRequest(sl, TimeRange(seg, seg + dur)))
            n += 1
        return n
    finally:
        batch.unpersist()


def ingest_stream(
    stream: DataFrame,
    table: ColumnarTable,
    ts_col: str,
    checkpoint_dir: str,
    pre_dedup: Callable[[DataFrame], DataFrame] | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Attach a streaming DataFrame to a ColumnarTable as a foreachBatch
    sink. The caller drives the query (processAllAvailable/awaitTermination)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_batch_segmented(table, batch_df, ts_col, pre_dedup)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
