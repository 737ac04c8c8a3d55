"""Quickstart: the engine end-to-end in one script.

Run:  python examples/quickstart.py  [sf_dir]  (default /root/testdata/sf0.001)

Covers the surfaces a reference-engine user needs on day one: create a
table, bulk-ingest, scan with pushdown, DML (update/delete/merge), time
travel + restore, compaction, a PromQL-style query, and an LLM-pipeline
dedup pass.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F
from pyspark.sql import types as T

from horaedb_spark import StorageSchema, TimeRange, UpdateMode
from horaedb_spark.core.session import get_spark
from horaedb_spark.storage import ColumnarTable, ScanRequest


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    from horaedb_spark.queries.tables import events_ms, load_table

    # -- 1. create + bulk ingest ------------------------------------------
    schema = StorageSchema(
        T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
        num_primary_keys=2,
        update_mode=UpdateMode.OVERWRITE,
    )
    table = ColumnarTable(
        spark, tempfile.mkdtemp(prefix="quickstart_"), schema, 15 * 86_400_000
    )
    ev = events_ms(spark, sf_dir).select("user_id", "event_type", "ts_ms", "value")
    table.bulk_ingest(ev, "ts_ms")
    print("rows:", table.scan().count(), "| ssts:", len(table.manifest.all_ssts()))

    # -- 2. scan with pushdown --------------------------------------------
    hot = table.scan(ScanRequest(predicate="value > 100.0", projections=["user_id", "value"]))
    print("hot rows:", hot.count())

    # -- 3. DML + time travel ---------------------------------------------
    before = max(h["file_id"] for h in table.history())
    table.update("event_type = 'error'", {"value": "value * 2"})
    table.delete("event_type = 'view'")
    print("after DML:", table.scan().count(),
          "| snapshot before:", table.scan(ScanRequest(as_of_seq=before)).count())
    table.restore(before)
    print("restored:", table.scan().count(), "| vacuumed:", len(table.vacuum()))

    # -- 4. PromQL-style query over the metric layer ----------------------
    from horaedb_spark.functions import promql

    samples = ev.select(
        F.col("event_type").alias("name"), "ts_ms", "value",
        F.col("user_id").cast("string").alias("sid"),
    )
    r = promql.rate(samples.filter(F.col("name") == "click"), ["sid"], 86_400_000)
    print("rate rows:", r.count())

    # -- 5. LLM-pipeline dedup over documents ------------------------------
    from horaedb_spark.functions.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    kept = exact_dedup(docs, "text", "doc_id")
    print("documents kept after exact dedup:", kept.count(), "of", docs.count())

    # -- 6. PromQL as a STRING (round 4): parser -> compiler -> engine -----
    from horaedb_spark.metric.engine import MetricEngine
    from horaedb_spark.metric.promql import promql_eval

    msamples = ev.select(
        F.col("event_type").alias("name"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("cohort"), (F.col("user_id") % 10).cast("string"),
        ).alias("labels"),
        "ts_ms", "value", F.lit(1).alias("seq"),
    )
    eng = MetricEngine(msamples)
    out = promql_eval(
        eng, 'topk(3, sum by (cohort) (rate(click[1d])))', 86_400_000
    )
    print("promql string eval rows:", out.count())


if __name__ == "__main__":
    main()
