"""Named-table catalog: the engine's table-management surface.

The reference manages tables by name through its storage API (open/create
with per-table options); this is the same contract on the library side —
`create_table` / `open_table` / `list_tables` / `drop_table` under one
catalog root, with per-table metadata (segment duration) persisted in a
``table.json`` sidecar so ``open_table`` needs only the name. The table's
COLUMN schema is already persisted and authoritative inside ColumnarTable
(schema.json, evolution-safe); the catalog adds the name -> directory
mapping and the engine parameters a reopen requires.

Driver-side metadata only — no Spark jobs; at cluster scale this lives
next to the driver exactly like the manifests do.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from horaedb_spark.core.schema import StorageSchema
from horaedb_spark.storage.backend import PosixBackend, StorageBackend
from horaedb_spark.storage.table import ColumnarTable, WriteConfig


class TableExistsError(RuntimeError):
    pass


class NoSuchTableError(RuntimeError):
    pass


class TableCatalog:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        backend: StorageBackend | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.backend = backend or PosixBackend()
        self.backend.makedirs(root)

    def _dir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "table.json")

    def create_table(
        self,
        name: str,
        schema: StorageSchema,
        segment_duration_ms: int,
        write_config: WriteConfig | None = None,
    ) -> ColumnarTable:
        d = self._dir(name)
        if os.path.exists(self._meta_path(name)):
            raise TableExistsError(name)
        table = ColumnarTable(
            self.spark, d, schema, segment_duration_ms,
            write_config=write_config, backend=self.backend,
        )
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segment_duration_ms": segment_duration_ms}, f)
        os.replace(tmp, self._meta_path(name))  # meta last: create is atomic-ish
        return table

    def open_table(
        self, name: str, write_config: WriteConfig | None = None
    ) -> ColumnarTable:
        if not os.path.exists(self._meta_path(name)):
            raise NoSuchTableError(name)
        with open(self._meta_path(name)) as f:
            meta = json.load(f)
        d = self._dir(name)
        # schema arg is a placeholder: the persisted schema.json inside the
        # table dir is authoritative on reopen (ColumnarTable contract)
        with open(os.path.join(d, "schema.json")) as f:
            schema = StorageSchema.from_json(json.load(f))
        return ColumnarTable(
            self.spark, d, schema, meta["segment_duration_ms"],
            write_config=write_config, backend=self.backend,
        )

    def list_tables(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.root)
            if os.path.exists(self._meta_path(n))
        )

    def drop_table(self, name: str, force: bool = False) -> None:
        """Drop a table. Refuses (unless ``force=True``) while zero-copy
        clones still reference the table's files — rmtree'ing the source
        would silently corrupt every shallow clone. Dropping a table that IS
        a shallow clone releases its leases first, so deferred physical
        deletes on the source can proceed."""
        if not os.path.exists(self._meta_path(name)):
            raise NoSuchTableError(name)
        table = self.open_table(name)
        clones = table.live_clone_roots()
        if clones and not force:
            raise RuntimeError(
                f"drop_table({name!r}) refused: zero-copy clones still "
                f"reference its files: {clones}. Drop the clones first "
                "(or re-create them with deep=True), or pass force=True "
                "to corrupt them knowingly."
            )
        table.release_clone_leases()
        self.backend.delete_tree(self._dir(name))

    def clone_table(self, src: str, dst: str, deep: bool = False) -> ColumnarTable:
        """CREATE TABLE dst CLONE src — catalog-level snapshot clone.
        Zero-copy by default (the clone's manifest references the source's
        SSTs as external; see ColumnarTable.clone for the maintenance
        contract); ``deep=True`` copies the files. The destination becomes a
        first-class catalog table (open/list/drop)."""
        if os.path.exists(self._meta_path(dst)):
            raise TableExistsError(dst)
        source = self.open_table(src)
        table = source.clone(self._dir(dst), deep=deep)
        tmp = self._meta_path(dst) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segment_duration_ms": source.segment_duration_ms}, f)
        os.replace(tmp, self._meta_path(dst))
        return table
