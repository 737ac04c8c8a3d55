"""Manifest-at-scale micro-benchmark — the reference's encoding/manifest
bench analogue (src/benchmarks/src/encoding_bench.rs:33-62 measures manifest
snapshot encode/decode; bench.rs:40-162 drives it). Measures, at 1e5-1e6
synthetic SST entries, the three costs that bound a 100 TB deployment's
metadata path:

- steady-state APPEND: deltas of ``batch`` adds each, with the soft
  threshold kicking BACKGROUND subprocess folds exactly as production
  writes do (r5 verdict #3: folds are off the write path, so append must
  scale ~linearly in rows appended, not in total SSTs);
- one full FOLD at final size (the worst-case snapshot rewrite);
- REPLAY on open (what a fresh driver pays to load the table).

Pure driver-side Python + JSON over a StorageBackend — no Spark session.
``bench.py`` embeds the numbers in its JSON line (``manifest`` key) and
``tests/test_manifest_scale.py`` pins regression bounds + the backpressure
invariant (unfolded delta count never exceeds the soft threshold after a
fold cycle).
"""

from __future__ import annotations

import os
import time

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.manifest import SNAP_PREFIX, Manifest, SstFile


def _synthetic_sst(fid: int, segment_ms: int = 7_200_000) -> SstFile:
    seg = (fid % 1000) * segment_ms
    return SstFile(
        file_id=fid,
        path=f"/data/__segment__={seg}/sst={fid}",
        time_range=TimeRange(seg, seg + segment_ms),
        max_sequence=fid,
        num_rows=8192,
        size_bytes=64 << 20,
        col_stats={"value": [0, 1000], "user_id": [fid % 97, 5000 + fid % 97]},
    )


def manifest_scale_bench(
    root: str,
    n_ssts: int = 200_000,
    batch: int = 10_000,
    soft: int = 25,
) -> dict:
    """Run the append/fold/replay cycle at ``n_ssts`` entries; returns the
    measured numbers. ``batch`` adds per delta mirrors a bulk ingest
    registering one delta per job; ``soft`` is the inline-fold threshold."""
    m = Manifest(root, merge_soft_threshold=soft, merge_hard_threshold=10 * soft)
    t0 = time.perf_counter()
    for start in range(0, n_ssts, batch):
        m.update([_synthetic_sst(fid) for fid in range(start, start + batch)], [])
    append_s = time.perf_counter() - t0

    # fold_s times the REMAINING fold work at final size: wait out any
    # in-flight background fold first so the number is stable, then fold
    # the tail synchronously.
    t0 = time.perf_counter()
    m.wait_for_background_fold()
    m.merge_snapshot()
    fold_s = time.perf_counter() - t0

    snap_files = [n for n in os.listdir(m.dir) if n.startswith(SNAP_PREFIX)]
    snap_bytes = max(
        os.path.getsize(os.path.join(m.dir, n)) for n in snap_files
    )

    t0 = time.perf_counter()
    m2 = Manifest(root, merge_soft_threshold=soft, merge_hard_threshold=10 * soft)
    replay_s = time.perf_counter() - t0
    assert len(m2.all_ssts()) == n_ssts, "replay lost entries"

    t0 = time.perf_counter()
    found = m2.find_ssts(TimeRange(0, 7_200_000))
    find_s = time.perf_counter() - t0

    return {
        "n_ssts": n_ssts,
        "append_s": round(append_s, 3),
        "fold_s": round(fold_s, 3),
        "replay_s": round(replay_s, 3),
        "find_s": round(find_s, 4),
        "found": len(found),
        "snapshot_bytes": snap_bytes,
        "bytes_per_sst": round(snap_bytes / n_ssts, 1),
        "unfolded_deltas_after": m.delta_count(),
    }


def py_md5_probe(iters: int = 300_000) -> float:
    """Fixed-work pure-Python calibration probe (identical to bench.py's
    py_md5_s) run IN-PROCESS with the metadata benches, so replay/decode
    drift across rounds can be normalized against the same interpreter +
    host state that produced them — rounds 5-8 observed identical code
    timing 1.2-1.6x apart session-to-session on this box."""
    import hashlib
    import time as _time

    t0 = _time.perf_counter()
    x = b"x" * 64
    for _ in range(iters):
        x = hashlib.md5(x).digest() * 4
    return _time.perf_counter() - t0


def remote_write_codec_bench(
    n_series: int = 2_000, samples_per_series: int = 50
) -> dict:
    """Remote-write protobuf encode/decode throughput — the reference's
    bench.rs remote-write parse benchmark analogue (src/benchmarks/benches/
    bench.rs:40-162). Pure-Python per-payload cost; in production the decode
    runs inside mapInPandas across executors (metric/ingest.decode_payloads),
    so per-core throughput here × cores = cluster ingest ceiling."""
    import time as _time

    from horaedb_spark.metric.ingest import (
        decode_write_request,
        encode_write_request,
    )

    series = [
        {
            "name": "http_requests_total",
            "labels": {
                "job": f"job{i % 20}",
                "instance": f"host{i % 97}:9100",
                "le": str((i % 8) * 50),
            },
            "samples": [
                (float(i * 1000 + j), 1_700_000_000_000 + j * 15_000)
                for j in range(samples_per_series)
            ],
        }
        for i in range(n_series)
    ]
    t0 = _time.perf_counter()
    payload = encode_write_request(series)
    encode_s = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    decoded = decode_write_request(payload)
    decode_s = _time.perf_counter() - t0
    n_samples = n_series * samples_per_series
    assert len(decoded) == n_samples  # decode flattens to one row per sample
    return {
        "n_series": n_series,
        "n_samples": n_samples,
        "payload_bytes": len(payload),
        "encode_s": round(encode_s, 4),
        "decode_s": round(decode_s, 4),
        "decode_samples_per_s": int(n_samples / decode_s),
    }
