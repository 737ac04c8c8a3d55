"""Driver-side micro-benchmarks, run OUT of the query-bench Spark session.

Prints ONE JSON line with the manifest-at-scale and remote-write-codec
numbers. bench.py invokes this as a subprocess AFTER the query loop's
session has stopped, so the pure-Python metadata benches never share a
process (heap, GC) with the timed Spark queries — the r4 verdict traced a
uniform +15-30% drift on unchanged queries to the enlarged single-session
bench and asked for this isolation (VERDICT r4 next-step #1).

Env:
- SPARK_GRAFT_MANIFEST_SSTS: size of the standard manifest run (200000).
- SPARK_GRAFT_MANIFEST_FULL: "1" (default) also runs the 1e6-SST scale
  point the SCALING.md claim is calibrated against (~2 min, metadata-only);
  set "0" to skip it on quick local iterations.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from horaedb_spark.storage.manifest_bench import (  # noqa: E402
    manifest_scale_bench,
    py_md5_probe,
    remote_write_codec_bench,
)


def main() -> None:
    out: dict = {}
    n = int(os.environ.get("SPARK_GRAFT_MANIFEST_SSTS", "200000"))
    # calibration FIRST, same process as the benches it normalizes
    try:
        out["calib_py_md5_s"] = round(py_md5_probe(), 4)
    except Exception as e:
        print(f"# calibration error: {e}", file=sys.stderr)
    try:
        out.update(manifest_scale_bench(
            tempfile.mkdtemp(prefix="manifest_bench_"), n_ssts=n
        ))
    except Exception as e:
        print(f"# manifest bench error: {e}", file=sys.stderr)
    try:
        out["remote_write_codec"] = remote_write_codec_bench()
    except Exception as e:
        print(f"# codec bench error: {e}", file=sys.stderr)
    if os.environ.get("SPARK_GRAFT_MANIFEST_FULL", "1") == "1":
        try:
            out["manifest_1e6"] = manifest_scale_bench(
                tempfile.mkdtemp(prefix="manifest_bench_full_"),
                n_ssts=1_000_000,
            )
        except Exception as e:
            print(f"# manifest 1e6 bench error: {e}", file=sys.stderr)
    # host-drift-normalized ratios (r7 verdict #5): replay and codec decode
    # divided by the in-process md5 probe — flat ratios across rounds mean
    # host drift, a moving ratio means a real regression
    md5 = out.get("calib_py_md5_s")
    if md5:
        norm: dict = {}
        if "replay_s" in out:
            norm["replay_per_md5"] = round(out["replay_s"] / md5, 2)
        codec = out.get("remote_write_codec", {})
        if codec.get("decode_s"):
            norm["codec_decode_per_md5"] = round(codec["decode_s"] / md5, 2)
        m1e6 = out.get("manifest_1e6", {})
        if m1e6.get("replay_s"):
            norm["replay_1e6_per_md5"] = round(m1e6["replay_s"] / md5, 2)
        out["normalized"] = norm
    print(json.dumps(out))


if __name__ == "__main__":
    main()
