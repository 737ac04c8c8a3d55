"""Merge-on-read dedup/merge — the reference's signature operator, Spark-first.

Reference semantics (cited into /root/reference):
- the scan stream is sorted by (PKs..., ``__seq__``) and a streaming MergeExec
  collapses runs of equal-PK rows (columnar_storage/src/read.rs:100-391);
- ``LastValueOperator`` (Overwrite mode): the last row in seq order wins
  (operator.rs:37-44; selected read.rs:485-486);
- ``BytesMergeOperator`` (Append mode): binary value columns of all rows
  sharing a PK concatenate in seq order; non-value columns take the first row
  (operator.rs:46-111; read.rs:487-489);
- merging is *per time segment*: per-segment plans are unioned, so equal PKs
  in different segments both survive (storage.rs:343-369).

Spark mapping (SURVEY.md §2 A7-A9): no custom physical operator. Overwrite is
a ``row_number() OVER (PARTITION BY segment, pks ORDER BY __seq__ DESC) = 1``
window; Append is a ``groupBy(segment, pks)`` with an ordered
``aggregate(array_sort(collect_list(struct(...))))`` binary concat. Both are
single-shuffle plans (hash exchange on the dedup key) that Catalyst executes
with whole-stage codegen; AQE handles skewed hot keys. This is the idiomatic
substitute for the reference's single-partition streaming merge — at 100 TB
the shuffle is what makes the merge *parallel*, where the reference's
MergeExec is an explicitly single-threaded pipeline breaker (read.rs:154-156).

Tie-break within equal (PK, __seq__): the reference keeps whichever row came
last in its (not-guaranteed-stable) sorted stream; we use the parquet row
position (``_metadata.row_index``) for a deterministic choice, which the scan
path threads through as ``__pos__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horaedb_spark.core.schema import RESERVED_COLUMN, SEQ_COLUMN, StorageSchema, UpdateMode

POS_COLUMN = "__pos__"

# ``__reserved__`` value marking a delete tombstone. The reference reserves
# this builtin for future use (types.rs:219-239, always NULL); we use it to
# carry row-level DELETE through the same versioning machinery: a tombstone
# is a normal row whose ``__seq__`` wins, filtered out after the merge
# (DIVERGENCES.md — the reference has no row-delete surface at all).
TOMBSTONE = 1


def dedup_overwrite(
    df: DataFrame, key_cols: list[str], order_col: str = SEQ_COLUMN, pos_col: str | None = None
) -> DataFrame:
    """Last version wins per key. NOT ``dropDuplicates`` (which keeps an
    arbitrary row) — ordering by the sequence column is the contract."""
    order = [F.col(order_col).desc()]
    if pos_col is not None and pos_col in df.columns:
        order.append(F.col(pos_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def merge_append(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    order_col: str = SEQ_COLUMN,
    pos_col: str | None = None,
) -> DataFrame:
    """Ordered binary concatenation per key (BytesMergeOperator).

    ``array_sort(collect_list(struct(seq, pos, values...)))`` gives a
    deterministic seq-ordered array per group; ``aggregate`` folds each value
    column with binary ``concat``. All JVM-side built-ins — no UDF.
    """
    order_fields = [F.col(order_col).alias("__o1__")]
    if pos_col is not None and pos_col in df.columns:
        order_fields.append(F.col(pos_col).alias("__o2__"))
    else:
        order_fields.append(F.lit(0).alias("__o2__"))
    packed = F.struct(*order_fields, *[F.col(c).alias(c) for c in value_cols])
    agg_cols = [
        F.array_sort(F.collect_list(packed)).alias("__versions__"),
        # Non-value columns take the FIRST row of the run (min seq) — the
        # reference's BytesMergeOperator rule (operator.rs:100-103). With
        # keep_builtin compaction this keeps re-merges against SSTs whose seq
        # falls inside the compacted range ordered identically to the
        # reference.
        F.min(F.col(order_col)).alias(order_col),
    ]
    out = df.groupBy(*key_cols).agg(*agg_cols)

    def _concat_fold(col_name):
        return lambda acc, x: F.concat(acc, F.coalesce(x[col_name], F.lit(b"")))

    for c in value_cols:
        out = out.withColumn(
            c, F.aggregate("__versions__", F.lit(b""), _concat_fold(c))
        )
    return out.drop("__versions__")


def apply_update_mode(
    df: DataFrame,
    schema: StorageSchema,
    extra_key_cols: list[str],
    keep_builtin: bool,
    pos_col: str | None = POS_COLUMN,
    drop_tombstones: bool | None = None,
) -> DataFrame:
    """Collapse versions per (extra_key_cols + primary keys) per update mode.

    ``drop_tombstones``: filter out keys whose WINNING version is a delete
    tombstone (OVERWRITE mode only). Default (None) drops them exactly when
    ``keep_builtin`` is false — user scans never see deleted rows, while the
    maintenance surface (compaction re-writes, keep_builtin=True) preserves
    tombstones so a partial compaction can't resurrect rows that still have
    live versions in non-picked SSTs (the LSM bottom-level rule)."""
    keys = [*extra_key_cols, *schema.primary_keys]
    if schema.update_mode == UpdateMode.OVERWRITE:
        out = dedup_overwrite(df, keys, SEQ_COLUMN, pos_col)
        drop_t = (not keep_builtin) if drop_tombstones is None else drop_tombstones
        if drop_t and RESERVED_COLUMN in out.columns:
            # NULL-safe: ordinary rows carry NULL __reserved__
            out = out.filter(
                F.coalesce(F.col(RESERVED_COLUMN) != TOMBSTONE, F.lit(True))
            )
    else:
        value_cols = [c for c in schema.value_fields if c in df.columns]
        out = merge_append(df, keys, value_cols, SEQ_COLUMN, pos_col)
        if keep_builtin and RESERVED_COLUMN not in out.columns:
            out = out.withColumn(RESERVED_COLUMN, F.lit(None).cast("long"))
    drop = [] if keep_builtin else [SEQ_COLUMN, RESERVED_COLUMN]
    if pos_col:
        drop.append(pos_col)
    return out.drop(*[c for c in drop if c in out.columns])


def is_deterministic_filter(pred: Column | str | None) -> bool:
    return pred is not None
