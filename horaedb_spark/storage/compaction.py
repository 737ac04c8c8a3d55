"""Compaction + TTL: the maintenance path.

Reference semantics (cited into /root/reference):
- **Picker** (compaction/picker.rs:84-188): split SSTs into expired
  (``time_range.end < now - ttl``, picker.rs:55-59, sst.rs:109-114) and
  uncompacted candidates; group candidates by segment
  (``time_range.start.truncate_by(segment_duration)``, picker.rs:136-153);
  iterate segments newest→oldest; within a segment sort files by size asc and
  greedily take up to ``input_sst_max_num`` (30) while the running total stays
  ≤ 1.1 × ``new_sst_max_size`` (1 GB); a pick needs ≥ ``input_sst_min_num``
  (5) files (picker.rs:155-188; defaults config.rs:38-50).
- **Executor** (compaction/executor.rs:155-253): re-run the scan/merge plan
  over the picked files with ``keep_builtin=true``, write ONE merged SST whose
  ``max_sequence`` is the new file id, swap the manifest (add new, delete
  inputs + expired) *before* physical deletes; physical deletes are
  best-effort ("no error should be returned", executor.rs:218-219).
- **Scheduler** (compaction/scheduler.rs:49-159): periodic picker loop +
  bounded task queue. Here: a synchronous ``run_once`` the caller invokes on
  a cadence (driver thread / external scheduler / every N streaming batches)
  — Spark jobs are the executor pool, so the reference's in-process runtime
  and 2 GB memory gate have no analogue to port.

The picker is pure metadata logic over the manifest (no Spark job); the
executor is one batch Spark job per picked segment. At 100 TB this is the
"small-files OPTIMIZE" job: each segment compacts independently and could be
submitted as its own parallel job.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from horaedb_spark.core.timeutil import TimeRange, truncate_by
from horaedb_spark.storage.manifest import SstFile
from horaedb_spark.storage.table import ColumnarTable, ScanRequest, WriteRequest


@dataclass
class SchedulerConfig:
    """Defaults mirror config.rs:38-50."""

    new_sst_max_size: int = 1 << 30  # 1 GiB
    input_sst_max_num: int = 30
    input_sst_min_num: int = 5
    memory_estimate_factor: float = 1.1
    ttl_ms: int | None = None
    # Admission control (executor.rs:93-137 / scheduler.rs:62-81): a task's
    # memory estimate is memory_estimate_factor × Σ input sizes; tasks only
    # run while inuse + estimate ≤ memory_limit_bytes, and at most
    # max_pending_tasks sit in the queue (excess triggers are dropped).
    memory_limit_bytes: int = 2 << 30  # 2 GiB
    max_pending_tasks: int = 10


@dataclass
class CompactionTask:
    inputs: list[SstFile] = field(default_factory=list)
    expired: list[SstFile] = field(default_factory=list)

    @property
    def is_noop(self) -> bool:
        return not self.inputs and not self.expired


def pick_all_candidates(
    ssts: list[SstFile],
    segment_duration_ms: int,
    config: SchedulerConfig,
    now_ms: int | None = None,
) -> list[CompactionTask]:
    """Every segment's pick in one pass — the cluster-scale complement of
    ``pick_candidate`` (which returns only the newest eligible segment, as
    the reference's single-node picker does): at 100 TB each segment
    compacts independently, so the scheduler can submit one Spark job per
    task concurrently (``Compactor.run_all``). Expired files ride on the
    first task (or form an expiry-only task when nothing else picks)."""
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    expired: list[SstFile] = []
    candidates: list[SstFile] = []
    for sst in ssts:
        if sst.in_compaction:
            continue
        if config.ttl_ms is not None and sst.is_expired(now_ms - config.ttl_ms):
            expired.append(sst)
        else:
            candidates.append(sst)
    by_segment: dict[int, list[SstFile]] = {}
    for sst in candidates:
        seg = truncate_by(sst.time_range.start, segment_duration_ms)
        by_segment.setdefault(seg, []).append(sst)
    max_total = config.new_sst_max_size * config.memory_estimate_factor
    tasks: list[CompactionTask] = []
    for seg in sorted(by_segment, reverse=True):
        files = sorted(by_segment[seg], key=lambda s: s.size_bytes)
        picked: list[SstFile] = []
        total = 0
        for sst in files:
            if len(picked) >= config.input_sst_max_num:
                break
            if total + sst.size_bytes > max_total and picked:
                break
            picked.append(sst)
            total += sst.size_bytes
        if len(picked) >= config.input_sst_min_num:
            tasks.append(CompactionTask(inputs=picked))
    if expired:
        if tasks:
            tasks[0].expired = expired
        else:
            tasks.append(CompactionTask(expired=expired))
    return tasks


def pick_candidate(
    ssts: list[SstFile],
    segment_duration_ms: int,
    config: SchedulerConfig,
    now_ms: int | None = None,
) -> CompactionTask:
    """Pure-metadata picker, 1:1 with picker.rs:84-188 (including the quirk
    that files already marked in-compaction are excluded, picker.rs:117-134).

    The reference has a unit bug here (ms vs µs TTL, picker.rs:57 vs
    time_ext.rs:213); we implement milliseconds consistently (SURVEY.md C2).
    """
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    task = CompactionTask()
    candidates: list[SstFile] = []
    for sst in ssts:
        if sst.in_compaction:
            continue
        if config.ttl_ms is not None and sst.is_expired(now_ms - config.ttl_ms):
            task.expired.append(sst)
        else:
            candidates.append(sst)

    by_segment: dict[int, list[SstFile]] = {}
    for sst in candidates:
        seg = truncate_by(sst.time_range.start, segment_duration_ms)
        by_segment.setdefault(seg, []).append(sst)

    max_total = config.new_sst_max_size * config.memory_estimate_factor
    for seg in sorted(by_segment, reverse=True):  # newest segment first
        files = sorted(by_segment[seg], key=lambda s: s.size_bytes)
        picked: list[SstFile] = []
        total = 0
        for sst in files:
            if len(picked) >= config.input_sst_max_num:
                break
            if total + sst.size_bytes > max_total and picked:
                break
            picked.append(sst)
            total += sst.size_bytes
        if len(picked) >= config.input_sst_min_num:
            task.inputs = picked
            return task
    return task


class Compactor:
    """Executor + scheduler over a ColumnarTable.

    ``run_once`` is the synchronous cycle; ``start``/``trigger``/``stop``
    give the reference's background loop (scheduler.rs:49-159): a daemon
    thread wakes every ``schedule_interval`` (10 s default, config.rs:38-50)
    or immediately on ``trigger()`` — the ``compact()`` manual entry point
    (storage.rs:372-374)."""

    def __init__(self, table: ColumnarTable, config: SchedulerConfig | None = None):
        import collections
        import threading

        self.table = table
        self.config = config or SchedulerConfig()
        self._stop_evt = None
        self._wake_evt = None
        self._thread = None
        # Admission control state (executor.rs:93-137, scheduler.rs:62-81):
        # in-use memory estimate + bounded pending-task queue.
        self._mem_lock = threading.Lock()
        self._inuse_bytes = 0
        self._queue: collections.deque[CompactionTask] = collections.deque()

    # -------------------------------------------- admission control (C3/C4)

    @staticmethod
    def task_estimate(task: CompactionTask, factor: float) -> int:
        """Memory estimate of a task: factor × Σ input sizes (executor.rs:
        97-104 — the reference sizes the merge by its inputs, not its
        output)."""
        return int(factor * sum(s.size_bytes for s in task.inputs))

    def try_acquire_memory(self, task: CompactionTask) -> bool:
        """The 2 GB in-use gate (executor.rs:93-114): admit the task only if
        inuse + estimate stays within the limit. Returns False (task stays
        pending) when over budget."""
        est = self.task_estimate(task, self.config.memory_estimate_factor)
        with self._mem_lock:
            if self._inuse_bytes + est > self.config.memory_limit_bytes:
                return False
            self._inuse_bytes += est
            return True

    def release_memory(self, task: CompactionTask) -> None:
        est = self.task_estimate(task, self.config.memory_estimate_factor)
        with self._mem_lock:
            self._inuse_bytes = max(0, self._inuse_bytes - est)

    def submit(self, task: CompactionTask) -> bool:
        """Bounded task queue (scheduler.rs:62-81, queue of 10): a full queue
        drops the submission — the next picker cycle re-picks the files, so
        nothing is lost, only deferred."""
        with self._mem_lock:
            if len(self._queue) >= self.config.max_pending_tasks:
                return False
            self._queue.append(task)
            return True

    def drain(self) -> list[SstFile]:
        """Execute queued tasks serially (the reference executes off the
        queue on a dedicated runtime, executor.rs:139-145). Tasks rejected by
        the memory gate are re-queued and retried on the next drain."""
        written: list[SstFile] = []
        deferred: list[CompactionTask] = []
        while True:
            with self._mem_lock:
                task = self._queue.popleft() if self._queue else None
            if task is None:
                break
            if not self.try_acquire_memory(task):
                deferred.append(task)
                continue
            try:
                out = self.execute(task)
            finally:
                self.release_memory(task)
            if out is not None:
                written.append(out)
        for task in deferred:
            self.submit(task)
        return written

    # ------------------------------------------------- background loop (C4)

    def start(self, schedule_interval_s: float = 10.0) -> None:
        import threading

        if self._thread is not None:
            return
        self._stop_evt = threading.Event()
        self._wake_evt = threading.Event()

        def loop():
            while not self._stop_evt.is_set():
                self._wake_evt.wait(timeout=schedule_interval_s)
                self._wake_evt.clear()
                if self._stop_evt.is_set():
                    return
                try:
                    while self.run_once() is not None:
                        pass
                except Exception:  # background loop must survive one failure
                    pass

        self._thread = threading.Thread(target=loop, name="sst-compact", daemon=True)
        self._thread.start()

    def trigger(self) -> None:
        """Manual compaction trigger (the reference's /compact endpoint)."""
        if self._wake_evt is not None:
            self._wake_evt.set()

    def stop(self) -> None:
        if self._thread is None:
            return
        self._stop_evt.set()
        self._wake_evt.set()
        self._thread.join(timeout=30)
        self._thread = None

    def run_all(
        self, parallelism: int = 4, now_ms: int | None = None
    ) -> list[SstFile]:
        """Compact EVERY eligible segment, ``parallelism`` tasks at a time —
        the cluster-scale OPTIMIZE job: each task is an independent Spark
        job (Spark schedules concurrent jobs from separate threads across
        the executor pool), the CAS manifest serializes the metadata
        commits, and the memory gate still bounds admitted work. Returns
        the new SSTs."""
        from concurrent.futures import ThreadPoolExecutor

        tasks = pick_all_candidates(
            self.table.manifest.all_ssts(),
            self.table.segment_duration_ms,
            self.config,
            now_ms,
        )
        if not tasks:
            return []
        written: list[SstFile] = []

        def run(task: CompactionTask) -> SstFile | None:
            if not self.try_acquire_memory(task):
                return None  # over budget this cycle; next run_all re-picks
            try:
                return self.execute(task)
            finally:
                self.release_memory(task)

        with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
            for out in pool.map(run, tasks):
                if out is not None:
                    written.append(out)
        return written

    def run_once(self, now_ms: int | None = None) -> SstFile | None:
        """One picker+executor cycle; returns the new SST if one was written.
        The memory gate applies here too: an over-budget pick is skipped (the
        next cycle re-picks — executor.rs returns the same "try later")."""
        task = pick_candidate(
            self.table.manifest.all_ssts(),
            self.table.segment_duration_ms,
            self.config,
            now_ms,
        )
        if task.is_noop:
            return None
        if not self.try_acquire_memory(task):
            return None
        try:
            return self.execute(task)
        finally:
            self.release_memory(task)

    def execute(self, task: CompactionTask) -> SstFile | None:
        manifest = self.table.manifest
        input_ids = [s.file_id for s in task.inputs]
        if input_ids and not manifest.try_mark_compacting(input_ids):
            return None  # lost the CAS race (picker.rs:100-105)
        try:
            new_sst = None
            if task.inputs:
                # The picker only ever picks within ONE segment; execute()
                # is public and hand-built tasks must honor that too — the
                # full-segment tombstone-GC check below derives the segment
                # from tr.start, so a multi-segment task would wrongly drop
                # tombstones from partially covered segments.
                segs = {
                    truncate_by(s.time_range.start, self.table.segment_duration_ms)
                    for s in task.inputs
                }
                if len(segs) > 1:
                    raise ValueError(
                        f"compaction task spans segments {sorted(segs)}; "
                        "inputs must share one segment (submit one task per "
                        "segment, as the picker does)"
                    )
                # Same scan/merge plan as a query, builtins kept so the merged
                # rows retain their winning __seq__ (executor.rs:163-171).
                tr = TimeRange(
                    min(s.time_range.start for s in task.inputs),
                    max(s.time_range.end for s in task.inputs),
                )
                # Tombstone GC (the LSM bottom-level rule): a rewrite that
                # covers EVERY live SST of its segment can drop delete
                # tombstones — no non-picked file can hold an older version
                # to resurrect. A partial pick must keep them.
                seg = truncate_by(tr.start, self.table.segment_duration_ms)
                seg_ids = {
                    s.file_id
                    for s in manifest.all_ssts()
                    if truncate_by(s.time_range.start, self.table.segment_duration_ms)
                    == seg
                }
                full_segment = seg_ids <= set(input_ids)
                merged = self.table.scan_ssts(
                    task.inputs,
                    ScanRequest(
                        keep_builtin=True,
                        ordered=False,
                        drop_tombstones=full_segment,
                    ),
                )
                seq_df = merged  # __seq__ already carries the max winning seq
                carries_tombstones = (
                    any(s.tombstone for s in task.inputs) and not full_segment
                )
                # Same rule for value-mutated inputs: a full-segment rewrite
                # collapses all versions (one per key — divergence gone); a
                # partial one keeps rows that still outrank older versions
                # with different values in non-picked files.
                carries_mutations = (
                    any(s.value_mutated for s in task.inputs) and not full_segment
                )
                new_sst = self._write_compacted(
                    seq_df,
                    tr,
                    carries_tombstones,
                    value_mutated=carries_mutations,
                    # rows keep their ORIGINAL __seq__, so the output may
                    # contain rows as old as the oldest input — restore()
                    # uses this to refuse rollbacks past this compaction
                    min_seq=min(s.effective_min_seq for s in task.inputs),
                )
            # Manifest swap BEFORE physical deletes (executor.rs:203-217).
            to_delete = input_ids + [s.file_id for s in task.expired]
            manifest.update([new_sst] if new_sst else [], to_delete)
            # Physical deletes, best-effort (executor.rs:218-253). External
            # (clone-referenced) files belong to another table: drop only
            # the reference, never the shared bytes. Symmetrically, while a
            # live zero-copy clone references THIS table's files, defer the
            # deletes (the dropped manifest entries become orphans that
            # vacuum reclaims once every clone lease is released).
            protected = bool(self.table.live_clone_roots())
            for sst in [*task.inputs, *task.expired]:
                if not sst.external and not protected:
                    self.table.backend.delete_tree(sst.path)
        except Exception:
            manifest.unmark_compacting(input_ids)
            raise
        # Bucketed tables keep their read-optimized mirror current through
        # compaction: only the partitions whose SST set this task changed
        # are rewritten (storage/bucketed.py). OUTSIDE the commit try-block
        # and best-effort: at this point the manifest swap is committed and
        # the input files deleted, so a mirror failure must not make the
        # task report as failed (the except above would unmark ids that no
        # longer exist, and a retry would scan deleted paths). A skipped
        # refresh self-heals — serve() detects staleness via is_fresh and
        # refreshes on the next read.
        if self.table.bucket_spec is not None:
            try:
                self.table.refresh_bucketed()
            except Exception:
                # warning, not stderr print: a driver running many
                # compaction tasks must be able to surface REPEATED refresh
                # failures (each leaves serve()'s auto_refresh re-attempting
                # a full refresh on every read) through log routing
                logging.getLogger(__name__).warning(
                    "bucketed mirror refresh deferred after compaction of "
                    "%s; serve() will retry on next read",
                    self.table.root,
                    exc_info=True,
                )
        return new_sst

    def _write_compacted(
        self,
        df,
        tr: TimeRange,
        carries_tombstones: bool = False,
        value_mutated: bool = False,
        min_seq: int | None = None,
    ) -> SstFile:
        """Write one merged SST carrying the surviving rows' __seq__ values.

        Reuses the table write layout but keeps the original sequences (the
        reference stamps the *file's* max_sequence as the new id but preserves
        merge results; here rows keep their winning __seq__ so a later scan
        still orders correctly against non-compacted files)."""
        import os

        from pyspark.sql import functions as F

        from horaedb_spark.core.schema import RESERVED_COLUMN, SEGMENT_COLUMN, SEQ_COLUMN

        t = self.table
        file_id = t._alloc_file_id()
        segment = tr.segment(t.segment_duration_ms)
        sst_dir = os.path.join(t.data_dir, f"{SEGMENT_COLUMN}={segment}", f"sst={file_id}")
        # __reserved__ passes through (not re-nulled): a surviving delete
        # tombstone from a partial compaction must keep masking older
        # versions in non-picked SSTs.
        cols = [*t.schema.user_columns, SEQ_COLUMN, RESERVED_COLUMN]
        out = df.select(*cols).sortWithinPartitions(*t.schema.primary_keys)
        out.write.options(**t.write_config.writer_options()).mode(
            "overwrite"
        ).parquet(t.backend.spark_path(sst_dir))
        from horaedb_spark.storage.table import _collect_col_stats, _parquet_stats

        num_rows, size_bytes = _parquet_stats(sst_dir, t.backend)
        return SstFile(
            file_id=file_id,
            path=sst_dir,
            time_range=tr,
            max_sequence=file_id,
            num_rows=num_rows,
            size_bytes=size_bytes,
            col_stats=_collect_col_stats(sst_dir, t.schema.user_columns, t.backend),
            tombstone=carries_tombstones,
            value_mutated=value_mutated,
            min_seq=min_seq,
        )
