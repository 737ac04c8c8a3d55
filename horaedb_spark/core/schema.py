"""Storage schema: the fixed PK-first columnar schema with builtin columns.

Mirrors the reference semantics (cited into /root/reference):
- a ``StorageSchema`` is a user Arrow schema plus ``num_primary_keys``; the
  first N fields are the primary key, the rest are value columns
  (columnar_storage/src/types.rs:149-196);
- two builtin columns are appended: ``__seq__`` (u64 MVCC sequence — here the
  write/commit version) and ``__reserved__`` (u64, always null in this
  snapshot) (types.rs:35-41,176-183; storage.rs:205-207);
- user schemas must not collide with builtin names (types.rs:159-175);
- update mode is ``Overwrite`` (last ``__seq__`` wins per PK) or ``Append``
  (binary value columns concatenate in ``__seq__`` order)
  (config.rs:166-172; read.rs:482-492).

Spark mapping: a ``StructType`` wrapper plus helpers that the write/scan paths
use — no engine extension is needed; merge-on-read semantics are expressed
with window functions / aggregations (SURVEY.md §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T

SEQ_COLUMN = "__seq__"
RESERVED_COLUMN = "__reserved__"
SEGMENT_COLUMN = "__segment__"  # our physical partition column (epoch-ms segment start)
BUILTIN_COLUMNS = (SEQ_COLUMN, RESERVED_COLUMN)


class UpdateMode(str, Enum):
    OVERWRITE = "overwrite"
    APPEND = "append"


@dataclass(frozen=True)
class StorageSchema:
    """User schema + num_primary_keys + update mode.

    ``fields`` is the user-declared StructType (PKs first). The physical
    parquet schema adds ``__seq__``/``__reserved__`` (and ``__segment__`` as a
    partition directory, which Spark materializes as a column on read).
    """

    fields: T.StructType
    num_primary_keys: int
    update_mode: UpdateMode = UpdateMode.OVERWRITE
    # Existence defaults (the Delta/Iceberg "add column with default"
    # semantics): a column listed here was added AFTER data was written, and
    # SSTs that predate it surface the default instead of NULL on read. This
    # is what makes a 100 TB schema migration metadata-only — no SST is
    # rewritten; the scan coalesces. Compaction materializes the default
    # into its outputs (it writes the scan's merged rows), so the coalesce
    # becomes an identity on compacted files over time.
    #
    # PRIMARY-KEY COLUMNS ONLY: a PK is never legitimately NULL in written
    # data, so NULL unambiguously means "file predates the column". On a
    # nullable VALUE column the per-COLUMN coalesce could not distinguish a
    # pre-migration file from a row that deliberately stored NULL (Delta/
    # Iceberg gate existence defaults per FILE; we don't track that) — it
    # would silently rewrite legitimate NULLs, so it is rejected outright.
    column_defaults: dict = field(default_factory=dict)
    value_fields: tuple[str, ...] = field(init=False)
    primary_keys: tuple[str, ...] = field(init=False)

    def __post_init__(self) -> None:
        names = [f.name for f in self.fields.fields]
        for col in self.column_defaults:
            if col not in names:
                raise ValueError(f"column_defaults references unknown column {col!r}")
            if col not in names[: self.num_primary_keys]:
                raise ValueError(
                    f"column_defaults on non-PK column {col!r}: an existence "
                    "default on a nullable value column cannot distinguish a "
                    "pre-migration file from a deliberately-stored NULL"
                )
        if not 0 < self.num_primary_keys <= len(names):
            raise ValueError(
                f"num_primary_keys={self.num_primary_keys} out of range for {len(names)} fields"
            )
        for reserved in (*BUILTIN_COLUMNS, SEGMENT_COLUMN):
            if reserved in names:
                raise ValueError(f"user schema must not contain builtin column {reserved!r}")
        if len(set(names)) != len(names):
            raise ValueError("duplicate column names in schema")
        object.__setattr__(self, "primary_keys", tuple(names[: self.num_primary_keys]))
        object.__setattr__(self, "value_fields", tuple(names[self.num_primary_keys :]))
        if self.update_mode == UpdateMode.APPEND:
            # BytesMergeOperator requires Binary value columns (operator.rs:63-69).
            for f in self.fields.fields[self.num_primary_keys :]:
                if not isinstance(f.dataType, T.BinaryType):
                    raise ValueError(
                        f"append mode requires binary value columns, {f.name} is {f.dataType}"
                    )

    @property
    def user_columns(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.fields.fields)

    def evolved(self, new_fields: list[T.StructField]) -> "StorageSchema":
        """Schema evolution: append nullable VALUE columns (never PKs — key
        identity is immutable, same constraint as the reference's sorted-PK
        layout). Existing SSTs are never rewritten; the scan's explicit read
        schema surfaces the new columns as NULL for rows written before the
        evolution."""
        names = {f.name for f in self.fields.fields}
        for f in new_fields:
            if f.name in names or f.name in (*BUILTIN_COLUMNS, SEGMENT_COLUMN):
                raise ValueError(f"evolved column {f.name!r} collides")
            if not f.nullable:
                raise ValueError(
                    f"evolved column {f.name!r} must be nullable (old SSTs "
                    "have no values for it)"
                )
        return StorageSchema(
            T.StructType([*self.fields.fields, *new_fields]),
            num_primary_keys=self.num_primary_keys,
            update_mode=self.update_mode,
            column_defaults=dict(self.column_defaults),
        )

    def to_json(self) -> dict:
        out = {
            "fields": self.fields.jsonValue(),
            "num_primary_keys": self.num_primary_keys,
            "update_mode": self.update_mode.value,
        }
        if self.column_defaults:
            out["column_defaults"] = dict(self.column_defaults)
        return out

    @classmethod
    def from_json(cls, d: dict) -> "StorageSchema":
        return cls(
            T.StructType.fromJson(d["fields"]),
            num_primary_keys=d["num_primary_keys"],
            update_mode=UpdateMode(d["update_mode"]),
            column_defaults=d.get("column_defaults", {}),
        )

    def physical_schema(self) -> T.StructType:
        """Schema as written to parquet (builtin columns appended, mirroring
        types.rs:176-183)."""
        out = list(self.fields.fields)
        out.append(T.StructField(SEQ_COLUMN, T.LongType(), False))
        out.append(T.StructField(RESERVED_COLUMN, T.LongType(), True))
        return T.StructType(out)

    def fill_required_projections(self, projection: list[str] | None) -> list[str] | None:
        """Force-include PK + ``__seq__`` columns so the merge step can run;
        caller drops them afterwards (types.rs:203-216, storage.rs:65-70)."""
        if projection is None:
            return None
        cols = list(dict.fromkeys(projection))
        for pk in self.primary_keys:
            if pk not in cols:
                cols.append(pk)
        if SEQ_COLUMN not in cols:
            cols.append(SEQ_COLUMN)
        return cols
