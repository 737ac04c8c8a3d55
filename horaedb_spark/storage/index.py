"""Secondary inverted index over a ColumnarTable column.

Reference parity: the metric-engine RFC's index tables map label values to
the series/files that contain them (docs/rfcs/20240827-metric-engine.md:88-137
— the same design the metric layer implements in ``metric/model.py``). This
is the storage-level generalization: a persisted posting list
``column value -> SST file ids``, consulted before a scan so a point lookup
on a *non-leading* primary-key column touches only the SSTs that contain the
value, instead of every SST in the time range.

Why min/max column stats aren't enough: footer stats prune range predicates
on columns the layout is clustered by; a point lookup on a high-cardinality
unclustered column (the classic "find this series/tag value" query) gets no
help from min/max when every file spans most of the value domain. The
posting list prunes exactly that case.

Soundness: pruning by containment is valid only for predicates on PRIMARY
KEY columns (or any column of an APPEND table). Under OVERWRITE, all
versions of a given PK share the PK columns' values, so every SST holding
any version of a matching key is in the posting list — the merge sees the
full version history and "newest __seq__ wins" is unchanged. For a non-PK
column the newest version could live in a file that doesn't match the
predicate (it must *shadow* an older matching version), so pruning would
resurrect dead rows; ``SecondaryIndex`` refuses to build there.

Scale shape: the build is one distributed pass over the SSTs — project
``(column, __seq__)``, distinct (map-side combined), write one small parquet
posting table under ``<table root>/index/<column>/``. Index size is
O(distinct values x files containing them) — metadata-sized next to the
data. Lookup reads the posting table (predicate pushed to its scan), and the
matched file-id set joins the manifest driver-side: like every manifest
operation, the result is a file *list*, inherently driver metadata.
Incremental maintenance appends postings for new SSTs; ``build`` here is the
full rebuild (compaction rewrites file ids, so rebuild-on-compact is the
simple correct policy).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from horaedb_spark.storage.table import (
    ColumnarTable,
    ScanRequest,
    SEQ_COLUMN,
)
from horaedb_spark.core.schema import UpdateMode


class SecondaryIndex:
    """Persisted inverted index ``value -> [file_id]`` for one column."""

    def __init__(self, table: ColumnarTable, column: str):
        if column not in table.schema.primary_keys and (
            table.schema.update_mode is not UpdateMode.APPEND
        ):
            raise ValueError(
                f"secondary index on non-PK column {column!r} of an OVERWRITE "
                "table is unsound (a newer shadowing version may live in a "
                "file the posting list skips)"
            )
        self.table = table
        self.column = column
        self.path = os.path.join(table.root, "index", column)

    def build(self) -> int:
        """Full (re)build: one pass over all SSTs. Returns posting count."""
        ssts = self.table.manifest.all_ssts()
        if not ssts:
            shutil.rmtree(self.path, ignore_errors=True)
            return 0
        reader = self.table.spark.read.option(
            "basePath", self.table.data_dir
        ).schema(self.table.schema.physical_schema())
        postings = (
            reader.parquet(*[s.path for s in ssts])
            .select(F.col(self.column).alias("value"), F.col(SEQ_COLUMN).alias("file_id"))
            .distinct()
        )
        tmp = self.path + "._tmp"
        postings.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        os.replace(tmp, self.path)
        return self.table.spark.read.parquet(self.path).count()

    def refresh(self) -> int:
        """Incremental maintenance: append postings for SSTs written since
        the last build/refresh (one distributed pass over only the NEW
        files — the steady-state cost on an ingesting table). File ids are
        monotonic, so "new" is a max-file-id watermark. Compaction replaces
        file ids wholesale; detect a vanished indexed id and fall back to a
        full rebuild (the simple correct policy — see module docstring).
        Returns postings added (or total, after a rebuild)."""
        if not os.path.exists(self.path):
            return self.build()
        spark = self.table.spark
        indexed = {
            r[0]
            for r in spark.read.parquet(self.path).select("file_id").distinct().collect()
        }
        live = {s.file_id for s in self.table.manifest.all_ssts()}
        if indexed - live:  # an indexed file was compacted away
            return self.build()
        new = [s for s in self.table.manifest.all_ssts() if s.file_id not in indexed]
        if not new:
            return 0
        reader = spark.read.option("basePath", self.table.data_dir).schema(
            self.table.schema.physical_schema()
        )
        postings = (
            reader.parquet(*[s.path for s in new])
            .select(
                F.col(self.column).alias("value"), F.col(SEQ_COLUMN).alias("file_id")
            )
            .distinct()
        )
        n = postings.count()
        postings.write.mode("append").parquet(self.path)
        return n

    def lookup(self, value) -> set[int]:
        """File ids whose SST contains ``value`` (pushdown-filtered read of
        the posting table — metadata-sized result)."""
        if not os.path.exists(self.path):
            raise FileNotFoundError(f"index not built: {self.path}")
        rows = (
            self.table.spark.read.parquet(self.path)
            .filter(F.col("value") == F.lit(value))
            .select("file_id")
            .collect()
        )
        return {r[0] for r in rows}

    def scan_eq(self, value, req: ScanRequest | None = None):
        """Index-pruned scan for ``column == value``: only posting-listed
        SSTs (intersected with the request's time range) are read; the
        equality predicate still applies row-level inside them."""
        req = req or ScanRequest()
        ids = self.lookup(value)
        ssts = [
            s
            for s in self.table.manifest.find_ssts(req.time_range)
            if s.file_id in ids
        ]
        lit = f"'{value}'" if isinstance(value, str) else str(value)
        eq = f"`{self.column}` = {lit}"
        pred = eq if req.predicate is None else f"({req.predicate}) AND {eq}"
        from dataclasses import replace

        return self.table.scan_ssts(ssts, replace(req, predicate=pred))
