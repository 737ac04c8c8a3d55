"""Control-plane CLI — the library-level stand-in for the reference's HTTP
surface (server/src/main.rs:59-80: hello / toggle / compact). The reference's
`main` exposes no query API over HTTP; ours is a thin driver around the
table/manifest/compaction primitives.

Usage:
    python -m horaedb_spark.cli manifest <table_root>
    python -m horaedb_spark.cli compact <table_root> --schema kv --segment-ms 7200000
    python -m horaedb_spark.cli scan <table_root> --schema kv --segment-ms 7200000 \
        [--predicate "pk1 = 11"] [--limit 20]

``--schema kv`` is the built-in demo schema (pk1,pk2 long PKs + long value);
library users construct their own StorageSchema in code.
"""

from __future__ import annotations

import argparse
import json
import sys


def _kv_schema():
    from pyspark.sql import types as T

    from horaedb_spark.core.schema import StorageSchema

    return StorageSchema(
        T.StructType(
            [
                T.StructField("pk1", T.LongType()),
                T.StructField("pk2", T.LongType()),
                T.StructField("value", T.LongType()),
            ]
        ),
        num_primary_keys=2,
    )


def cmd_manifest(args) -> int:
    from horaedb_spark.storage.manifest import Manifest

    m = Manifest(args.root)
    ssts = m.all_ssts()
    print(
        json.dumps(
            {
                "n_ssts": len(ssts),
                "total_rows": sum(s.num_rows for s in ssts),
                "total_bytes": sum(s.size_bytes for s in ssts),
                "pending_deltas": m.delta_count(),
                "ssts": [s.to_json() for s in ssts],
            },
            indent=2,
        )
    )
    return 0


def _open_table(args):
    from horaedb_spark.core.session import get_spark
    from horaedb_spark.storage.table import ColumnarTable

    if args.schema != "kv":
        print(f"unknown --schema {args.schema!r} (only 'kv' is built in)", file=sys.stderr)
        raise SystemExit(2)
    spark = get_spark(app_name="horaedb_cli")
    return ColumnarTable(spark, args.root, _kv_schema(), args.segment_ms)


def cmd_compact(args) -> int:
    from horaedb_spark.storage.compaction import Compactor, SchedulerConfig

    table = _open_table(args)
    compactor = Compactor(
        table, SchedulerConfig(input_sst_min_num=args.min_inputs, ttl_ms=args.ttl_ms)
    )
    n = 0
    while compactor.run_once() is not None:
        n += 1
    print(json.dumps({"compactions": n, "n_ssts": len(table.manifest.all_ssts())}))
    return 0


def cmd_scan(args) -> int:
    from horaedb_spark.storage.table import ScanRequest

    table = _open_table(args)
    df = table.scan(ScanRequest(predicate=args.predicate))
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_promql(args) -> int:
    """Evaluate a PromQL string against a samples parquet file.

    The parquet must hold (name string, labels map<string,string> OR the
    events-table shape, ts_ms long, value double[, seq long]); with
    ``--events`` the testdata events table is adapted the way the query
    suite does (labels = user/cohort from user_id)."""
    from pyspark.sql import functions as F

    from horaedb_spark.core.session import get_spark
    from horaedb_spark.metric.engine import MetricEngine
    from horaedb_spark.metric.promql import _duration_ms, promql_eval

    spark = get_spark(app_name="horaedb_promql")
    if args.events:
        from horaedb_spark.queries.tables import events_ms

        ev = events_ms(spark, args.source)
        samples = ev.select(
            F.col("event_type").alias("name"),
            F.create_map(
                F.lit("user"), F.col("user_id").cast("string"),
                F.lit("cohort"), (F.col("user_id") % 10).cast("string"),
            ).alias("labels"),
            "ts_ms",
            "value",
            F.col("event_id").alias("seq"),
        )
    else:
        samples = spark.read.parquet(args.source)
    step = args.step
    step_ms = int(step) if step.isdigit() else _duration_ms(step)
    out = promql_eval(MetricEngine(samples), args.query, step_ms)
    for row in out.orderBy("series_key", "ts_ms").limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def _load_samples(spark, source: str, events: bool):
    from pyspark.sql import functions as F

    if events:
        from horaedb_spark.queries.tables import events_ms

        ev = events_ms(spark, source)
        return ev.select(
            F.col("event_type").alias("name"),
            F.create_map(
                F.lit("user"), F.col("user_id").cast("string"),
                F.lit("cohort"), (F.col("user_id") % 10).cast("string"),
            ).alias("labels"),
            "ts_ms",
            "value",
            F.col("event_id").alias("seq"),
        )
    return spark.read.parquet(source)


def cmd_alerts(args) -> int:
    """Evaluate an alerting rule and print per-series states at the
    expression's latest step — the CLI twin of GET /api/v1/alerts
    (pending while the consecutive run is shorter than --for steps,
    firing once it reaches it; active_since_ms is the run start)."""
    from pyspark.sql import functions as F

    from horaedb_spark.core.session import get_spark
    from horaedb_spark.metric.engine import MetricEngine
    from horaedb_spark.metric.promql import _duration_ms
    from horaedb_spark.metric.rules import AlertingRule, evaluate_alert_states

    spark = get_spark(app_name="horaedb_alerts")
    samples = _load_samples(spark, args.source, args.events)
    step = args.step
    step_ms = int(step) if step.isdigit() else _duration_ms(step)
    rule = AlertingRule(args.name, args.query, step_ms, for_steps=args.for_steps)
    states = evaluate_alert_states(MetricEngine(samples), rule)
    now = states.agg(F.max("ts_ms")).first()[0]
    if now is None:
        print(json.dumps({"alerts": []}))
        return 0
    rows = (
        states.filter(F.col("ts_ms") == now)
        .orderBy("series_key")
        .limit(args.limit)
        .collect()
    )
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="horaedb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pm = sub.add_parser("manifest", help="dump a table's manifest")
    pm.add_argument("root")
    pm.set_defaults(fn=cmd_manifest)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("root")
    common.add_argument("--schema", default="kv")
    common.add_argument("--segment-ms", type=int, default=2 * 3600 * 1000)

    pc = sub.add_parser("compact", parents=[common], help="run compaction to quiescence")
    pc.add_argument("--min-inputs", type=int, default=2)
    pc.add_argument("--ttl-ms", type=int, default=None)
    pc.set_defaults(fn=cmd_compact)

    ps = sub.add_parser("scan", parents=[common], help="merge-on-read scan")
    ps.add_argument("--predicate", default=None)
    ps.add_argument("--limit", type=int, default=20)
    ps.set_defaults(fn=cmd_scan)

    pq = sub.add_parser(
        "promql", help="evaluate a PromQL string against a samples source"
    )
    pq.add_argument("source", help="samples parquet path, or an sf dir with --events")
    pq.add_argument("query", help='e.g. \'sum by (cohort) (rate(click[1d]))\'')
    pq.add_argument("--step", default="1d")
    pq.add_argument("--limit", type=int, default=50)
    pq.add_argument(
        "--events", action="store_true",
        help="treat source as a testdata dir; adapt the events table",
    )
    pq.set_defaults(fn=cmd_promql)

    pa = sub.add_parser(
        "alerts", help="evaluate an alerting rule; print per-series states"
    )
    pa.add_argument("source", help="samples parquet path, or an sf dir with --events")
    pa.add_argument("query", help="alert expression, e.g. 'sum by (cohort) (rate(error[1d])) > 0.02'")
    pa.add_argument("--name", default="Alert")
    pa.add_argument("--step", default="1d")
    pa.add_argument("--for-steps", type=int, default=1, dest="for_steps")
    pa.add_argument("--limit", type=int, default=50)
    pa.add_argument(
        "--events", action="store_true",
        help="treat source as a testdata dir; adapt the events table",
    )
    pa.set_defaults(fn=cmd_alerts)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
