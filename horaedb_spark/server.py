"""HTTP control surface (SURVEY.md §2 B3) — the reference's actix-web
endpoints re-expressed over the library primitives.

The reference server (server/src/main.rs:59-80) exposes exactly three
endpoints on the storage node: ``GET /`` (hello), ``GET /toggle`` (pause /
resume the synthetic write loop), ``GET /compact`` (manually trigger
compaction). This module mirrors that surface with the stdlib HTTP server —
a driver-side control plane, NOT a data path: queries stay in Spark, and at
cluster scale this runs next to the driver the way the reference's actix
app runs next to its storage (main.rs:82-116).

Extra read-only endpoints: ``GET /manifest`` surfaces the SST list the CLI
prints, and ``GET /scan?predicate=...&limit=N`` serves a BOUNDED
merge-on-read peek as JSON (limit capped at 1000) — debugging/observability
hooks a real deployment needs. Analytical queries stay in Spark; the scan
endpoint is a row-bounded driver-side read, never a data path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from horaedb_spark.storage.compaction import Compactor

_FIVE_MIN_MS = 300_000


def _lookback_ms(lb_raw: str | None, step_ms: int) -> int | None:
    """Staleness lookback for the HTTP query endpoints.

    Explicit ``lookback_delta`` wins (seconds-float or duration string).
    Absent it, align with Prometheus's fixed 5m default whenever the grid
    is FINER than 5m — the regime where a Prometheus user's first
    query_range would otherwise silently differ on sparse data
    (DIVERGENCES #24a). Coarse grids (step >= 5m) keep the engine's
    one-step default (returning None): a 5m lookback on a 1d grid over
    sparse data yields empty vectors, the documented reason the engine
    diverges there."""
    if lb_raw is not None:
        return (
            int(float(lb_raw) * 1000)
            if lb_raw.replace(".", "", 1).isdigit()
            else _srv_duration_ms(lb_raw)
        )
    return _FIVE_MIN_MS if step_ms < _FIVE_MIN_MS else None


def _srv_duration_ms(raw: str) -> int:
    from horaedb_spark.metric.promql import _duration_ms

    return _duration_ms(raw)


class WriteToggle:
    """Pause/resume flag for a synthetic/streaming write loop — the
    reference's ``keep_writing`` AtomicBool (main.rs:66-73, 187-216)."""

    def __init__(self) -> None:
        self._on = threading.Event()
        self._on.set()

    def toggle(self) -> bool:
        if self._on.is_set():
            self._on.clear()
        else:
            self._on.set()
        return self._on.is_set()

    @property
    def writing(self) -> bool:
        return self._on.is_set()

    def wait_until_writing(self, timeout: float | None = None) -> bool:
        return self._on.wait(timeout)


class ControlServer:
    """Thin HTTP wrapper: hello / toggle / compact (+ manifest)."""

    def __init__(
        self,
        compactor: Compactor,
        toggle: WriteToggle | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        metric_engine=None,
        write_table=None,
        rules=None,
        query_cache_size: int = 256,
    ) -> None:
        self.compactor = compactor
        self.toggle = toggle or WriteToggle()
        # Optional list of RecordingRule / AlertingRule (metric/rules.py):
        # enables /api/v1/rules (definitions) and /api/v1/alerts (active
        # alerts at the latest evaluated step) — the endpoints Grafana's
        # alert list reads (Prometheus HTTP API: rules, alerts).
        self.rules = list(rules or [])
        # Metric metadata (family -> type/help/unit) and exemplars received
        # on /api/v1/write, serving /api/v1/metadata and
        # /api/v1/query_exemplars. Prometheus itself holds exemplars in a
        # bounded in-memory circular buffer (storage/exemplar), so a deque
        # with maxlen is the faithful model — operational state, never a
        # data path.
        import collections

        self.metadata: dict[str, dict] = {}
        self.exemplars: collections.deque = collections.deque(maxlen=100_000)
        # /scan is a debug peek with a per-REQUEST row cap; without a
        # concurrency cap N simultaneous peeks still pile N collect jobs
        # onto the driver. Bounded, non-blocking: excess requests get 429
        # instead of queueing (a debug surface must never back up the
        # server thread pool that query_range shares).
        self._scan_gate = threading.BoundedSemaphore(4)
        # Optional MetricEngine: enables the Prometheus-compatible
        # /api/v1/query_range endpoint (the RFC's PromQL-over-HTTP contract,
        # docs/rfcs/20220702-prometheus-read-extension.md) backed by the
        # string parser in metric/promql.py.
        self.metric_engine = metric_engine
        # Optional ColumnarTable (rules_table_schema shape) as the
        # /api/v1/write remote-write sink; when no static engine is
        # attached, the query endpoints serve the WRITTEN samples — the
        # full Prometheus loop (write -> query) over one process.
        self.write_table = write_table
        # Bounded LRU cache of READY query_range response payloads, keyed on
        # the full parsed request (query, step, start, end, lookback, limit)
        # PLUS the serving store's mutation version (VERDICT r11 task 4 —
        # the read RFC's repeated-evaluation pattern,
        # docs/rfcs/20220702-prometheus-read-extension.md:84-99): a repeated
        # dashboard query skips PromQL recompile AND the collect job
        # entirely, and any ingest bumps the manifest mutation counter so
        # the next request recomputes — invalidation is by key, never by
        # clock. Payload dicts are treated as immutable after insert, so a
        # hit is byte-equal to the miss that populated it. Size 0 disables.
        self.query_cache_size = query_cache_size
        self._qr_cache: collections.OrderedDict = collections.OrderedDict()
        self._qr_lock = threading.Lock()
        # single-flight stripes: a cold burst of identical requests (the
        # multi-user dashboard refresh) serializes per stripe and re-checks
        # the cache under the gate, so one Spark job serves the burst.
        # Plain striped locks (vs per-key events) cannot leak on error
        # paths — release is a with-statement.
        self._qr_gates = [threading.Lock() for _ in range(64)]
        self.query_cache_stats = {"hits": 0, "misses": 0, "computes": 0}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet
                pass

            def _reply(self, payload: dict, status: int = 200) -> None:
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path == "/":
                    # main.rs:59-61: hello
                    self._reply({"hello": "horaedb-spark"})
                elif self.path == "/toggle":
                    # main.rs:63-73: flip the synthetic writer
                    self._reply({"writing": outer.toggle.toggle()})
                elif self.path == "/compact":
                    # main.rs:75-80: manual compaction trigger; run_once keeps
                    # the handler synchronous like the reference's await
                    sst = outer.compactor.run_once()
                    self._reply({"compacted": sst is not None,
                                 "new_sst": sst.file_id if sst else None})
                elif self.path.startswith("/scan"):
                    from urllib.parse import parse_qs, urlparse

                    from horaedb_spark.storage.table import ScanRequest

                    q = parse_qs(urlparse(self.path).query)
                    pred = q.get("predicate", [None])[0]
                    if not outer._scan_gate.acquire(blocking=False):
                        self._reply(
                            {"error": "too many concurrent /scan requests"},
                            status=429,
                        )
                        return
                    try:
                        limit = min(int(q.get("limit", ["100"])[0]), 1000)
                        df = outer.compactor.table.scan(
                            ScanRequest(predicate=pred, ordered=True)
                        ).limit(limit)
                        rows = [r.asDict() for r in df.collect()]
                    except Exception as e:  # bad predicate -> client error
                        self._reply({"error": str(e)[:500]}, status=400)
                        return
                    finally:
                        outer._scan_gate.release()
                    self._reply({"n": len(rows), "rows": rows})
                elif self.path.startswith("/api/v1/query?") or self.path == "/api/v1/query":
                    # Prometheus INSTANT query: ?query=<promql>[&time=<s>]
                    # [&step=<dur>] — evaluates at the single aligned step
                    # containing `time` (default: the latest step with
                    # data). resultType "vector", one [ts, "v"] per series
                    # — the other half of the Prometheus read API
                    # (docs/rfcs/20220702-prometheus-read-extension.md).
                    # The step-grid engine needs a resolution, so `step`
                    # is accepted like query_range (default 1d).
                    from urllib.parse import parse_qs, urlparse

                    if outer.metric_engine is None and outer.write_table is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from horaedb_spark.metric.promql import (
                        PromQLCompiler,
                        PromQLError,
                        _duration_ms,
                    )

                    q = parse_qs(urlparse(self.path).query)
                    try:
                        query = q["query"][0]
                        step_raw = q.get("step", ["1d"])[0]
                        step_ms = (
                            int(step_raw)
                            if step_raw.isdigit()
                            else _duration_ms(step_raw)
                        )
                        # Prometheus's per-request lookback_delta; absent,
                        # sub-5m grids default to Prometheus's 5m staleness
                        # window (DIVERGENCES #24a)
                        lookback_ms = _lookback_ms(
                            q.get("lookback_delta", [None])[0], step_ms
                        )
                        cap = min(int(q.get("limit", ["10000"])[0]), 100_000)
                        # same repeated-query cache as query_range, keyed on
                        # the STEP-ALIGNED evaluation instant (computable
                        # from the raw param without the engine): time=100,
                        # 100.0 and 100.4 at step 1s all evaluate the same
                        # aligned step, so they share one entry instead of
                        # each paying a full compute (ADVICE r13; raw-string
                        # keying before). When `time` is absent the default
                        # latest-step lookup is itself a Spark job, and with
                        # an unchanged store version its result is
                        # deterministic — a hit skips that job too.
                        if "time" in q:
                            t_ms = int(float(q["time"][0]) * 1000)
                            aligned_ms = t_ms - t_ms % step_ms
                        else:
                            aligned_ms = None
                        cache_key = (
                            "instant", query, step_ms,
                            aligned_ms, lookback_ms, cap,
                            outer._serving_version(),
                        )
                        def _compute() -> dict:
                            eng = outer._query_engine()
                            if aligned_ms is not None:
                                at_ms = aligned_ms
                            else:  # default: latest aligned step with data
                                at_ms = PromQLCompiler(
                                    eng, step_ms
                                )._bounds()[1]
                            df = PromQLCompiler(
                                eng,
                                step_ms,
                                lookback_ms,
                                start_ms=at_ms,
                                end_ms=at_ms,
                            ).compile(query)
                            from pyspark.sql import functions as F

                            rows = (
                                df.filter(F.col("ts_ms") == at_ms)
                                .orderBy("series_key")
                                .limit(cap)
                                .collect()
                            )
                            result = [
                                {
                                    "metric": dict(
                                        kv.split("=", 1)
                                        for kv in r["series_key"].split(",")
                                        if "=" in kv
                                    ),
                                    "value": [
                                        r["ts_ms"] / 1000.0, str(r["value"])
                                    ],
                                }
                                for r in rows
                            ]
                            return {
                                "status": "success",
                                "data": {
                                    "resultType": "vector", "result": result
                                },
                            }

                        payload = outer._qr_cached(cache_key, _compute)
                    except (PromQLError, KeyError, ValueError) as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                        return
                    self._reply(payload)
                elif self.path.startswith("/api/v1/query_range"):
                    # Prometheus HTTP API shape: ?query=<promql>&step=<dur>
                    # [&start=<s>&end=<s>] — start/end are unix SECONDS
                    # (float accepted), matching the Prometheus API, so a
                    # response timestamp round-trips as a request bound
                    # unchanged; response is the standard
                    # {"status","data":{"resultType":"matrix","result":[...]}}
                    # envelope. Row-bounded like /scan — a dashboard query
                    # surface, not a bulk-export path.
                    from urllib.parse import parse_qs, urlparse

                    if outer.metric_engine is None and outer.write_table is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from horaedb_spark.metric.promql import (
                        PromQLCompiler,
                        PromQLError,
                        _duration_ms,
                    )

                    q = parse_qs(urlparse(self.path).query)
                    try:
                        query = q["query"][0]
                        step_raw = q.get("step", ["1d"])[0]
                        step_ms = (
                            int(step_raw)
                            if step_raw.isdigit()
                            else _duration_ms(step_raw)
                        )
                        # start/end define the evaluation range for
                        # time()/vector()/absent*() — the Prometheus API
                        # contract; absent they fall back to the data range
                        start_ms = (
                            int(float(q["start"][0]) * 1000)
                            if "start" in q
                            else None
                        )
                        end_ms = (
                            int(float(q["end"][0]) * 1000)
                            if "end" in q
                            else None
                        )
                        # absent lookback_delta: sub-5m grids default to
                        # Prometheus's 5m staleness window (DIVERGENCES #24a)
                        lookback_ms = _lookback_ms(
                            q.get("lookback_delta", [None])[0], step_ms
                        )
                        cap = min(int(q.get("limit", ["10000"])[0]), 100_000)
                        # repeated-dashboard-query fast path: same request
                        # against the same store version skips compile AND
                        # collect (see query_cache comment in __init__)
                        cache_key = (
                            "range", query, step_ms, start_ms, end_ms,
                            lookback_ms, cap, outer._serving_version(),
                        )
                        def _compute() -> dict:
                            eng = outer._query_engine()
                            df = PromQLCompiler(
                                eng,
                                step_ms,
                                lookback_ms,
                                start_ms=start_ms,
                                end_ms=end_ms,
                            ).compile(query)
                            from pyspark.sql import functions as F

                            if start_ms is not None:
                                df = df.filter(F.col("ts_ms") >= start_ms)
                            if end_ms is not None:
                                # Prometheus treats `end` as INCLUSIVE: a
                                # response timestamp fed back as `end` must
                                # still return that sample (round-trip safe).
                                df = df.filter(F.col("ts_ms") <= end_ms)
                            rows = (
                                df.orderBy("series_key", "ts_ms")
                                .limit(cap)
                                .collect()
                            )
                            series: dict[str, list] = {}
                            for r in rows:
                                series.setdefault(r["series_key"], []).append(
                                    [r["ts_ms"] / 1000.0, str(r["value"])]
                                )
                            result = [
                                {
                                    "metric": dict(
                                        kv.split("=", 1)
                                        for kv in skey.split(",")
                                        if "=" in kv
                                    ),
                                    "values": vals,
                                }
                                for skey, vals in sorted(series.items())
                            ]
                            return {
                                "status": "success",
                                "data": {
                                    "resultType": "matrix", "result": result
                                },
                            }

                        payload = outer._qr_cached(cache_key, _compute)
                    except (PromQLError, KeyError, ValueError) as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                        return
                    self._reply(payload)
                elif self.path.startswith("/api/v1/fields"):
                    # Multi-field catalog listing (RFC 20240827:106-113):
                    # the (field_name, field_type) rows of one metric — the
                    # HTTP counterpart of MetricEngine.fields(), selectable
                    # in queries via the __field__ matcher. Catalog-bounded
                    # (rows per metric = its field count); ids stay
                    # engine-internal.
                    from urllib.parse import parse_qs, urlparse

                    eng = outer._query_engine()
                    if eng is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    q = parse_qs(urlparse(self.path).query)
                    metric = q.get("metric", [""])[0]
                    if not metric:
                        self._reply(
                            {"status": "error",
                             "error": "missing metric parameter"},
                            status=400,
                        )
                        return
                    rows = sorted(
                        {
                            (r["field_name"], r["field_type"])
                            for r in eng.fields(metric).collect()
                        }
                    )
                    self._reply(
                        {
                            "status": "success",
                            "data": [
                                {"name": n, "type": t} for n, t in rows
                            ],
                        }
                    )
                elif self.path.startswith("/api/v1/labels") or self.path.startswith(
                    "/api/v1/label/"
                ) or self.path.startswith("/api/v1/series"):
                    # Prometheus metadata API: label names, label values,
                    # and series listing by match[] selector — backed by the
                    # engine's inverted index (RFC D4), all driver-bounded.
                    from urllib.parse import parse_qs, unquote, urlparse

                    eng = outer._query_engine()
                    if eng is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from pyspark.sql import functions as F

                    parsed = urlparse(self.path)
                    q = parse_qs(parsed.query)
                    try:
                        if parsed.path == "/api/v1/labels":
                            names = sorted(
                                r["tag_key"]
                                for r in eng.index.select("tag_key")
                                .distinct()
                                .collect()
                            )
                            self._reply(
                                {"status": "success",
                                 "data": ["__name__", *names]}
                            )
                        elif parsed.path.startswith("/api/v1/label/"):
                            name = unquote(
                                parsed.path[len("/api/v1/label/"):].removesuffix(
                                    "/values"
                                )
                            )
                            if name == "__name__":
                                vals = sorted(
                                    r["metric_name"]
                                    for r in eng.metrics.select("metric_name")
                                    .distinct()
                                    .collect()
                                )
                            else:
                                vals = sorted(
                                    r["tag_value"]
                                    for r in eng.index.filter(
                                        F.col("tag_key") == name
                                    )
                                    .select("tag_value")
                                    .distinct()
                                    .collect()
                                )
                            self._reply({"status": "success", "data": vals})
                        else:  # /api/v1/series?match[]=selector
                            from horaedb_spark.metric.promql import (
                                Selector,
                                parse_promql,
                            )

                            sel = parse_promql(q["match[]"][0])
                            if not isinstance(sel, Selector):
                                raise ValueError("match[] must be a selector")
                            tsids = eng.resolve_tsids(
                                sel.name, list(sel.matchers)
                            )
                            cap = min(int(q.get("limit", ["1000"])[0]), 10_000)
                            keys = (
                                eng.series.join(tsids, "tsid", "left_semi")
                                .select("series_key")
                                .distinct()
                                .orderBy("series_key")
                                .limit(cap)
                                .collect()
                            )
                            data = [
                                {
                                    "__name__": sel.name,
                                    **dict(
                                        kv.split("=", 1)
                                        for kv in r["series_key"].split(",")
                                        if "=" in kv
                                    ),
                                }
                                for r in keys
                            ]
                            self._reply({"status": "success", "data": data})
                    except Exception as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                elif self.path == "/api/v1/rules":
                    # Prometheus rules API: the configured recording +
                    # alerting rule DEFINITIONS in the standard envelope
                    # (one group; the reference deployment model is a
                    # single rule file). No evaluation happens here.
                    from horaedb_spark.metric.rules import AlertingRule

                    rules_out = []
                    for r in outer.rules:
                        if isinstance(r, AlertingRule):
                            rules_out.append(
                                {
                                    "type": "alerting",
                                    "name": r.name,
                                    "query": r.expr,
                                    "duration": r.for_steps
                                    * r.step_ms
                                    / 1000.0,
                                    "state": "unknown",
                                    "health": "ok",
                                    "labels": {},
                                }
                            )
                        else:
                            rules_out.append(
                                {
                                    "type": "recording",
                                    "name": r.name,
                                    "query": r.expr,
                                    "health": "ok",
                                    "labels": {},
                                }
                            )
                    self._reply(
                        {
                            "status": "success",
                            "data": {
                                "groups": [
                                    {
                                        "name": "default",
                                        "file": "attached",
                                        "interval": 0,
                                        "rules": rules_out,
                                    }
                                ]
                            },
                        }
                    )
                elif self.path == "/api/v1/alerts":
                    # Prometheus alerts API: ACTIVE alerts — every alerting
                    # rule evaluated over the engine's step grid, reporting
                    # series whose state at the LATEST evaluated step is
                    # pending or firing (a series that fired earlier but
                    # recovered is not active). activeAt is the run start —
                    # the step the alert entered pending. Driver-bounded
                    # like the other read endpoints (alert cardinality is
                    # operational, not data-sized).
                    eng = outer._query_engine()
                    if eng is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from pyspark.sql import functions as F

                    from horaedb_spark.metric.promql import PromQLError
                    from horaedb_spark.metric.rules import (
                        AlertingRule,
                        evaluate_alert_states,
                    )

                    alerts = []
                    try:
                        for r in outer.rules:
                            if not isinstance(r, AlertingRule):
                                continue
                            states = evaluate_alert_states(eng, r)
                            # "now" is the expression's own latest grid
                            # point (range functions label buckets at the
                            # bucket start, so the compiler's raw data
                            # bound overshoots it). One extra metadata-
                            # sized job per rule — an ops endpoint, not a
                            # data path.
                            now_ms = states.agg(F.max("ts_ms")).first()[0]
                            if now_ms is None:
                                continue
                            rows = (
                                states.filter(F.col("ts_ms") == now_ms)
                                .orderBy("series_key")
                                .limit(10_000)
                                .collect()
                            )
                            for row in rows:
                                alerts.append(
                                    {
                                        "labels": {
                                            "alertname": row["alertname"],
                                            **dict(
                                                kv.split("=", 1)
                                                for kv in row[
                                                    "series_key"
                                                ].split(",")
                                                if "=" in kv
                                            ),
                                        },
                                        "state": row["state"],
                                        "activeAt": row["active_since_ms"]
                                        / 1000.0,
                                        "value": str(row["value"]),
                                    }
                                )
                    except (PromQLError, ValueError) as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                        return
                    self._reply(
                        {"status": "success", "data": {"alerts": alerts}}
                    )
                elif self.path.startswith("/api/v1/metadata"):
                    # Prometheus metadata API: metric family -> type/help/
                    # unit, fed by the MetricMetadata records received on
                    # /api/v1/write (remote_write.proto; the reference's
                    # pb_reader parses them on the ingest path). Types are
                    # lowercased like Prometheus's API.
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    want = q.get("metric", [None])[0]
                    cap = min(int(q.get("limit", ["1000"])[0]), 10_000)
                    data: dict[str, list] = {}
                    for fam, md in sorted(outer.metadata.items()):
                        if want is not None and fam != want:
                            continue
                        if len(data) >= cap:
                            break
                        data[fam] = [
                            {
                                "type": md["type"].lower(),
                                "help": md["help"],
                                "unit": md["unit"],
                            }
                        ]
                    self._reply({"status": "success", "data": data})
                elif self.path.startswith("/api/v1/query_exemplars"):
                    # Prometheus exemplars API: ?query=<selector>[&start=
                    # <s>&end=<s>] over the bounded in-memory exemplar
                    # buffer — series selected by name + label matchers
                    # (driver-side evaluation; the buffer is operational-
                    # sized by construction), grouped by series identity.
                    from urllib.parse import parse_qs, urlparse

                    from horaedb_spark.metric.engine import matches_labels
                    from horaedb_spark.metric.promql import (
                        PromQLError,
                        Selector,
                        parse_promql,
                    )

                    q = parse_qs(urlparse(self.path).query)
                    try:
                        sel = parse_promql(q["query"][0])
                        if not isinstance(sel, Selector):
                            raise ValueError(
                                "query must be a series selector"
                            )
                        start_ms = (
                            int(float(q["start"][0]) * 1000)
                            if "start" in q
                            else None
                        )
                        end_ms = (
                            int(float(q["end"][0]) * 1000)
                            if "end" in q
                            else None
                        )
                    except (PromQLError, KeyError, ValueError) as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                        return
                    matchers = list(sel.matchers)
                    by_series: dict[tuple, dict] = {}
                    for ex in outer.exemplars:
                        if ex["name"] != sel.name:
                            continue
                        if not matches_labels(ex["series_labels"], matchers):
                            continue
                        if start_ms is not None and ex["ts_ms"] < start_ms:
                            continue
                        # end is INCLUSIVE, matching /api/v1/query_range
                        if end_ms is not None and ex["ts_ms"] > end_ms:
                            continue
                        ident = tuple(sorted(ex["series_labels"].items()))
                        ent = by_series.setdefault(
                            ident,
                            {
                                "seriesLabels": {
                                    "__name__": sel.name,
                                    **ex["series_labels"],
                                },
                                "exemplars": [],
                            },
                        )
                        ent["exemplars"].append(
                            {
                                "labels": ex["labels"],
                                "value": str(ex["value"]),
                                "timestamp": ex["ts_ms"] / 1000.0,
                            }
                        )
                    out = [by_series[k] for k in sorted(by_series)]
                    for ent in out:
                        ent["exemplars"].sort(key=lambda e: e["timestamp"])
                    self._reply({"status": "success", "data": out})
                elif self.path.startswith("/federate"):
                    # Prometheus federation: current samples for the
                    # match[] selectors in the text exposition format —
                    # `name{labels} value timestamp_ms` — so another
                    # Prometheus can scrape this engine. Serves each
                    # series' LATEST sample (with its own timestamp, as
                    # /federate does). Driver-bounded text endpoint.
                    from urllib.parse import parse_qs, urlparse

                    eng = outer._query_engine()
                    if eng is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from pyspark.sql import functions as F

                    from horaedb_spark.metric.promql import (
                        PromQLError,
                        Selector,
                        parse_promql,
                    )

                    q = parse_qs(urlparse(self.path).query)
                    try:
                        sels = [parse_promql(m) for m in q.get("match[]", [])]
                        if not sels or not all(
                            isinstance(s, Selector) for s in sels
                        ):
                            raise ValueError(
                                "match[] must be one or more selectors"
                            )
                        cap = min(int(q.get("limit", ["10000"])[0]), 100_000)
                        lines = []
                        for sel in sels:
                            df = eng.select_series(
                                sel.name, list(sel.matchers) or None
                            )
                            latest = (
                                df.groupBy("series_key")
                                .agg(
                                    F.max_by("value", "ts_ms").alias("value"),
                                    F.max("ts_ms").alias("ts_ms"),
                                )
                                .orderBy("series_key")
                                .limit(cap)
                                .collect()
                            )
                            for r in latest:
                                labels = ",".join(
                                    f'{kv.split("=", 1)[0]}='
                                    f'"{kv.split("=", 1)[1]}"'
                                    for kv in r["series_key"].split(",")
                                    if "=" in kv
                                )
                                lines.append(
                                    f"{sel.name}{{{labels}}} "
                                    f"{r['value']} {r['ts_ms']}"
                                )
                    except (PromQLError, ValueError) as e:
                        self._reply(
                            {"status": "error", "error": str(e)[:500]},
                            status=400,
                        )
                        return
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/api/v1/status/tsdb":
                    # Prometheus TSDB stats: series/label-pair counts and
                    # the top-10 cardinality offenders — THE debugging
                    # surface for series explosions. All metadata-grain
                    # aggregates over the engine's catalog tables (rows ~
                    # #series, never #samples).
                    eng = outer._query_engine()
                    if eng is None:
                        self._reply(
                            {"status": "error",
                             "error": "no metric engine attached"},
                            status=400,
                        )
                        return
                    from pyspark.sql import functions as F

                    n_series = eng.series.select("tsid").distinct().count()
                    label_pairs = (
                        eng.index.select("tag_key", "tag_value")
                        .distinct()
                        .count()
                    )
                    by_metric = (
                        eng.series.join(
                            F.broadcast(
                                eng.metrics.select(
                                    "metric_id", "metric_name"
                                )
                            ),
                            "metric_id",
                        )
                        .groupBy("metric_name")
                        .agg(F.countDistinct("tsid").alias("n"))
                        .orderBy(F.desc("n"), "metric_name")
                        .limit(10)
                        .collect()
                    )
                    by_label = (
                        eng.index.groupBy("tag_key")
                        .agg(F.countDistinct("tag_value").alias("n"))
                        .orderBy(F.desc("n"), "tag_key")
                        .limit(10)
                        .collect()
                    )
                    pairs_by_label = (
                        eng.index.groupBy("tag_key")
                        .agg(
                            F.countDistinct("tag_key", "tag_value").alias(
                                "n"
                            )
                        )
                        .orderBy(F.desc("n"), "tag_key")
                        .limit(10)
                        .collect()
                    )
                    self._reply(
                        {
                            "status": "success",
                            "data": {
                                "headStats": {
                                    "numSeries": n_series,
                                    "numLabelPairs": label_pairs,
                                },
                                "seriesCountByMetricName": [
                                    {"name": r["metric_name"],
                                     "value": r["n"]}
                                    for r in by_metric
                                ],
                                "labelValueCountByLabelName": [
                                    {"name": r["tag_key"], "value": r["n"]}
                                    for r in by_label
                                ],
                                "seriesCountByLabelValuePair": [
                                    {"name": r["tag_key"], "value": r["n"]}
                                    for r in pairs_by_label
                                ],
                            },
                        }
                    )
                elif self.path == "/api/v1/status/buildinfo":
                    # Grafana probes this when validating a Prometheus
                    # datasource; serve the minimal envelope it checks.
                    self._reply(
                        {
                            "status": "success",
                            "data": {
                                "application": "horaedb-spark",
                                "version": "0.1.0",
                                "features": {},
                            },
                        }
                    )
                elif self.path == "/manifest":
                    ssts = outer.compactor.table.manifest.all_ssts()
                    self._reply({
                        "n_ssts": len(ssts),
                        "total_rows": sum(s.num_rows for s in ssts),
                        "ssts": [s.file_id for s in ssts],
                    })
                else:
                    self._reply({"error": "not found"}, status=404)

            def do_POST(self) -> None:  # noqa: N802 (http.server API)
                base = self.path.split("?", 1)[0]
                if base in (
                    "/api/v1/query",
                    "/api/v1/query_range",
                    "/api/v1/series",
                    "/api/v1/labels",
                    "/api/v1/query_exemplars",
                ):
                    # Prometheus clients (Grafana included) POST these with
                    # a form-encoded body when the query string is long;
                    # parameters merge with any URL query string. Delegate
                    # to the GET handler with the merged path.
                    try:
                        n = int(self.headers.get("Content-Length", "0"))
                        body = self.rfile.read(n).decode() if n else ""
                    except (ValueError, UnicodeDecodeError):
                        self._reply(
                            {"status": "error", "error": "bad form body"},
                            status=400,
                        )
                        return
                    qs = self.path.split("?", 1)[1] if "?" in self.path else ""
                    merged = "&".join(p for p in (qs, body) if p)
                    self.path = base + (f"?{merged}" if merged else "")
                    self.do_GET()
                    return
                if self.path != "/api/v1/write":
                    self._reply({"error": "not found"}, status=404)
                    return
                # Prometheus remote-write receive: a WriteRequest protobuf
                # in the body (metric/ingest.py wire codec), landed into
                # the attached ColumnarTable keyed (name, series_key,
                # ts_ms) — re-sent samples overwrite, never duplicate
                # (the reference's remote-write ingest contract,
                # metric_engine/src/types.rs:27-36). This endpoint is the
                # driver-mediated single-request path; BULK payload decode
                # is the distributed decode_payloads mapInPandas route.
                # Divergence: bodies are RAW protobuf — Prometheus's
                # snappy framing needs a codec this container doesn't
                # ship (415 tells the client).
                if outer.write_table is None:
                    self._reply(
                        {"error": "no write table attached"}, status=400
                    )
                    return
                if self.headers.get("Content-Encoding", "") == "snappy":
                    self._reply(
                        {"error": "snappy framing not supported; "
                                  "send raw protobuf"},
                        status=415,
                    )
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    if not 0 < n <= 8 * 1024 * 1024:
                        self._reply(
                            {"error": "body size out of bounds"}, status=413
                        )
                        return
                    body = self.rfile.read(n)
                    from horaedb_spark.metric.ingest import (
                        decode_exemplars,
                        decode_metadata,
                        decode_write_request,
                    )

                    # metadata and exemplars ride the same WriteRequest
                    # (Prometheus sends metadata-only requests too — they
                    # must land even when no samples are present)
                    n_md = 0
                    for md in decode_metadata(body):
                        if md.get("family_name"):
                            outer.metadata[md["family_name"]] = md
                            n_md += 1
                    exs = decode_exemplars(body)
                    outer.exemplars.extend(exs)

                    samples = decode_write_request(body)
                    if not samples:
                        self._reply(
                            {"written": 0, "metadata": n_md,
                             "exemplars": len(exs)}
                        )
                        return
                    rows = [
                        (
                            s["name"],
                            ",".join(
                                f"{k}={v}"
                                for k, v in sorted(s["labels"].items())
                            ),
                            int(s["ts_ms"]),
                            float(s["value"]),
                        )
                        for s in samples
                    ]
                    spark = outer.write_table.spark
                    df = spark.createDataFrame(
                        rows,
                        "name string, series_key string, "
                        "ts_ms long, value double",
                    )
                    ssts = outer.write_table.bulk_ingest(df, "ts_ms")
                    self._reply(
                        {
                            "written": len(rows),
                            "ssts": [s.file_id for s in ssts],
                            "metadata": n_md,
                            "exemplars": len(exs),
                        }
                    )
                except Exception as e:  # malformed payload -> client error
                    self._reply({"error": str(e)[:500]}, status=400)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def _serving_version(self):
        """Cache-key component identifying WHAT data the read API would
        serve right now. Store-backed engines (MetricStore.engine) carry a
        live ``_version_fn`` reading the backing tables' manifest mutation
        counters — an ingest bumps them, so cached responses stop matching
        and the next request recomputes (mirror-backed engines re-resolve
        catalog files per action, so data CAN change under a long-lived
        engine). A plain in-memory MetricEngine has no version source; its
        frames are immutable by construction, so identity is the version.
        Remote-write mode keys on the sink table's mutation counter."""
        if self.metric_engine is not None:
            vf = getattr(self.metric_engine, "_version_fn", None)
            if vf is not None:
                return ("store", *vf())
            return ("eng", id(self.metric_engine))
        if self.write_table is not None:
            # local counter = exact same-process invalidation; the durable
            # token (memoized ≤1s) notices OTHER instances writing to the
            # same sink root — bounded staleness instead of forever-stale
            return (
                "wt",
                self.write_table.manifest.mutations,
                self.write_table.manifest.durable_token(),
            )
        return None

    def _qr_cache_get(self, key, count: bool = True):
        if self.query_cache_size <= 0:
            return None
        with self._qr_lock:
            payload = self._qr_cache.get(key)
            if count:
                if payload is not None:
                    self._qr_cache.move_to_end(key)
                    self.query_cache_stats["hits"] += 1
                else:
                    self.query_cache_stats["misses"] += 1
            return payload

    def _qr_cached(self, key, compute):
        """Serve a query payload from the cache, computing at most ONCE per
        concurrent burst: cold identical requests serialize on a striped
        lock and re-check under the gate (double-checked locking), so a
        burst of the same dashboard query runs one Spark job and the rest
        are served the cached bytes. Distinct keys sharing a stripe contend
        only while cold. Cache disabled: compute directly, ungated."""
        if self.query_cache_size <= 0:
            with self._qr_lock:
                self.query_cache_stats["computes"] += 1
            return compute()
        hit = self._qr_cache_get(key)
        if hit is not None:
            return hit
        with self._qr_gates[hash(key) % len(self._qr_gates)]:
            hit = self._qr_cache_get(key, count=False)
            if hit is not None:
                return hit
            with self._qr_lock:
                self.query_cache_stats["computes"] += 1
            payload = compute()
            self._qr_cache_put(key, payload)
            return payload

    def _qr_cache_put(self, key, payload) -> None:
        if self.query_cache_size <= 0:
            return
        with self._qr_lock:
            self._qr_cache[key] = payload
            self._qr_cache.move_to_end(key)
            while len(self._qr_cache) > self.query_cache_size:
                self._qr_cache.popitem(last=False)

    def _query_engine(self):
        """The engine the read API serves: the attached static engine, or
        (remote-write mode) a fresh engine over the write sink's current
        contents. The derived frames are lazy — construction is cheap and
        every query sees the latest committed SSTs."""
        if self.metric_engine is not None:
            return self.metric_engine
        if self.write_table is None:
            return None
        from pyspark.sql import functions as F

        from horaedb_spark.metric.engine import MetricEngine

        # Serve the DURABLE state, not this handle's memoized view: another
        # instance over the same sink root may have written since our last
        # sync (the cross-instance case the cache's durable token detects —
        # without this resync the rebuilt engine would re-serve the stale
        # view the invalidation just evicted). Conditional: own writes never
        # trigger it (they advance the local view as they land), so the
        # mutation counter — part of the cache key — only moves when state
        # actually changed. Runs only on cache misses (engines are built
        # inside _compute); metadata-sized.
        self.write_table.manifest.sync_if_behind()
        samples = self.write_table.scan().select(
            "name",
            F.str_to_map("series_key", F.lit(","), F.lit("=")).alias("labels"),
            "ts_ms",
            "value",
            F.lit(0).alias("seq"),
        )
        return MetricEngine(samples)

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="horaedb-http", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
