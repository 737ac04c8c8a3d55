"""Manifest: the SST metadata log (delta files + snapshot + in-memory list).

Mirrors the reference semantics (cited into /root/reference):
- every write appends a *delta* record ``{to_adds, to_deletes}`` to the log and
  updates the in-memory SST list (columnar_storage/src/manifest/mod.rs:115-157);
- a background/threshold-driven *merge* folds deltas into a snapshot and
  deletes them (manifest/mod.rs:184-334); soft threshold schedules a merge,
  hard threshold rejects writes — write backpressure (mod.rs:248-262; defaults
  soft=50 / hard=90, config.rs:145-155);
- ``find_ssts(range)`` filters the in-memory list by half-open overlap
  (mod.rs:165-172; types.rs:125-127);
- recovery on open: merge leftover deltas, read snapshot, load list
  (mod.rs:76-113).

Spark mapping: this is *driver-side metadata* — pure Python + JSON files; no
Spark job ever runs here. The delta/snapshot encoding is JSON instead of the
reference's custom binary (encoding is an internal detail; the semantics —
atomic snapshot replace, delta replay order, backpressure thresholds — are the
contract). Single-writer assumption documented in SURVEY.md §7.3(e); the
reference is equally single-process (sst.rs:39-43).

At 100 TB the manifest stays tiny relative to data (36 bytes/SST in the
reference; ~100 B JSON here): 1e6 SSTs ≈ 100 MB, held once on the driver —
the same envelope the reference targets.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, replace

from horaedb_spark.core.timeutil import TimeRange

SNAPSHOT_NAME = "snapshot.json"
DELTA_PREFIX = "delta-"


class ManifestBackpressure(RuntimeError):
    """Raised when the delta count exceeds the hard threshold (mod.rs:258-262)."""


@dataclass(frozen=True)
class SstFile:
    """One SST's metadata (sst.rs:154-160 FileMeta + id + path).

    ``col_stats`` extends the reference's time-range-only FileMeta with
    per-column (min, max) collected from the parquet footers at write time:
    the manifest can then skip SSTs for *value* predicates the same way it
    skips by time — file-level pruning before Spark ever lists a path.
    ``None`` means "stats unknown" (older manifests, unsupported types):
    the file is never skipped. Keys are column names; values are 2-lists
    of JSON scalars (int/float/str/bool)."""

    file_id: int
    path: str
    time_range: TimeRange
    max_sequence: int
    num_rows: int
    size_bytes: int
    in_compaction: bool = False  # runtime-only CAS flag (sst.rs:97-107)
    col_stats: dict | None = None
    # True for SSTs referenced from ANOTHER table's data dir (zero-copy
    # clone): readable like any file, but this table's maintenance must
    # never physically delete it — only drop the reference.
    external: bool = False
    # True if the SST (possibly) holds delete-tombstone rows. Scans of SST
    # sets with no tombstone file skip the tombstone machinery entirely, so
    # a delete-free table reads zero extra columns.
    tombstone: bool = False
    # True if the SST was produced by a version-MUTATING DML (update /
    # merge_into matched-row rewrite): its rows outrank older versions whose
    # VALUE columns differ. Scans over a set containing such a file must use
    # SQL semantics for value predicates (apply after the merge) — the
    # reference's filter-before-merge shortcut is only sound when versions of
    # a key never diverge in value columns. Cleared by a full-segment
    # compaction (all versions collapse to one per key).
    value_mutated: bool = False
    # Minimum ORIGINAL row __seq__ the file may contain. Writes stamp one
    # seq == file_id, so None means "== file_id"; compaction/recluster
    # outputs carry rows from older inputs and record min over their inputs
    # — restore(as_of_seq) uses this to refuse a rollback that would drop a
    # file still holding rows from before the rollback point.
    min_seq: int | None = None

    @property
    def effective_min_seq(self) -> int:
        return self.file_id if self.min_seq is None else self.min_seq

    def to_json(self) -> dict:
        d = {
            "file_id": self.file_id,
            "path": self.path,
            "start": self.time_range.start,
            "end": self.time_range.end,
            "max_sequence": self.max_sequence,
            "num_rows": self.num_rows,
            "size_bytes": self.size_bytes,
        }
        if self.col_stats is not None:
            d["col_stats"] = self.col_stats
        if self.external:
            d["external"] = True
        if self.tombstone:
            d["tombstone"] = True
        if self.value_mutated:
            d["value_mutated"] = True
        if self.min_seq is not None:
            d["min_seq"] = self.min_seq
        return d

    @classmethod
    def from_json(cls, d: dict) -> "SstFile":
        return cls(
            file_id=d["file_id"],
            path=d["path"],
            time_range=TimeRange(d["start"], d["end"]),
            max_sequence=d["max_sequence"],
            num_rows=d["num_rows"],
            size_bytes=d["size_bytes"],
            col_stats=d.get("col_stats"),
            external=d.get("external", False),
            tombstone=d.get("tombstone", False),
            value_mutated=d.get("value_mutated", False),
            min_seq=d.get("min_seq"),
        )

    def is_expired(self, expire_before_ms: int) -> bool:
        """TTL check (sst.rs:109-114): expired iff the file's whole range ends
        before the expiry watermark."""
        return self.time_range.end < expire_before_ms


class Manifest:
    """Delta-log + snapshot manifest over a local/posix directory.

    Thread-safe for the single-process case (an RLock mirrors the reference's
    RwLock around the in-memory list).
    """

    def __init__(
        self,
        root: str,
        merge_soft_threshold: int = 50,
        merge_hard_threshold: int = 90,
    ):
        self.root = root
        self.dir = os.path.join(root, "manifest")
        self.delta_dir = os.path.join(self.dir, "delta")
        self.soft = merge_soft_threshold
        self.hard = merge_hard_threshold
        self._lock = threading.RLock()
        self._ssts: dict[int, SstFile] = {}
        self._next_delta_id = 0
        os.makedirs(self.delta_dir, exist_ok=True)
        self._recover()

    # -- recovery (mod.rs:76-113) -------------------------------------------

    def _delta_files(self) -> list[str]:
        names = [n for n in os.listdir(self.delta_dir) if n.startswith(DELTA_PREFIX)]
        # Replay in delta-id order; ids are zero-padded so lexical == numeric.
        return sorted(names)

    def _recover(self) -> None:
        snap_path = os.path.join(self.dir, SNAPSHOT_NAME)
        if os.path.exists(snap_path):
            with open(snap_path) as f:
                snap = json.load(f)
            for d in snap["ssts"]:
                sst = SstFile.from_json(d)
                self._ssts[sst.file_id] = sst
        for name in self._delta_files():
            with open(os.path.join(self.delta_dir, name)) as f:
                delta = json.load(f)
            self._apply_delta(delta)
            self._next_delta_id = max(self._next_delta_id, int(name[len(DELTA_PREFIX) :]) + 1)
        # Fold leftover deltas into the snapshot, as the reference does on open.
        if self._delta_files():
            self.merge_snapshot()

    def _apply_delta(self, delta: dict) -> None:
        for d in delta.get("to_adds", []):
            sst = SstFile.from_json(d)
            self._ssts[sst.file_id] = sst
        for fid in delta.get("to_deletes", []):
            self._ssts.pop(fid, None)

    # -- update path (mod.rs:115-157,248-262) --------------------------------

    def add_file(self, sst: SstFile) -> None:
        self.update([sst], [])

    def update(self, to_adds: list[SstFile], to_deletes: list[int]) -> None:
        with self._lock:
            n_deltas = len(self._delta_files())
            if n_deltas >= self.hard:
                raise ManifestBackpressure(
                    f"manifest delta count {n_deltas} >= hard threshold {self.hard}"
                )
            delta = {
                "to_adds": [s.to_json() for s in to_adds],
                "to_deletes": list(to_deletes),
                "ts_ms": int(time.time() * 1000),
            }
            path = os.path.join(self.delta_dir, f"{DELTA_PREFIX}{self._next_delta_id:012d}")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(delta, f)
            os.replace(tmp, path)
            self._next_delta_id += 1
            self._apply_delta(delta)
            if n_deltas + 1 >= self.soft:
                # The reference schedules a background merge at the soft
                # threshold; single-process driver code just merges inline.
                self.merge_snapshot()

    # -- snapshot merge (mod.rs:184-334) --------------------------------------

    def merge_snapshot(self) -> None:
        with self._lock:
            deltas = self._delta_files()
            snap = {"ssts": [s.to_json() for s in self._ssts.values()]}
            snap_path = os.path.join(self.dir, SNAPSHOT_NAME)
            tmp = snap_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(snap, f)
            os.replace(tmp, snap_path)  # atomic swap = the commit point
            for name in deltas:
                os.unlink(os.path.join(self.delta_dir, name))

    # -- queries (mod.rs:165-172) ---------------------------------------------

    def find_ssts(self, time_range: TimeRange | None = None) -> list[SstFile]:
        with self._lock:
            ssts = list(self._ssts.values())
        if time_range is None:
            return sorted(ssts, key=lambda s: s.file_id)
        return sorted(
            (s for s in ssts if s.time_range.overlaps(time_range)),
            key=lambda s: s.file_id,
        )

    def all_ssts(self) -> list[SstFile]:
        return self.find_ssts(None)

    def delta_count(self) -> int:
        return len(self._delta_files())

    # -- compaction bookkeeping (sst.rs:97-107) -------------------------------

    def try_mark_compacting(self, file_ids: list[int]) -> bool:
        """CAS-style: mark all-or-nothing; returns False if any is already
        being compacted."""
        with self._lock:
            if any(
                fid not in self._ssts or self._ssts[fid].in_compaction for fid in file_ids
            ):
                return False
            for fid in file_ids:
                self._ssts[fid] = replace(self._ssts[fid], in_compaction=True)
            return True

    def unmark_compacting(self, file_ids: list[int]) -> None:
        with self._lock:
            for fid in file_ids:
                if fid in self._ssts:
                    self._ssts[fid] = replace(self._ssts[fid], in_compaction=False)
