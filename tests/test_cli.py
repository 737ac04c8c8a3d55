"""CLI surface: the alerts subcommand (twin of GET /api/v1/alerts)."""

import json

from horaedb_spark import cli


def test_cli_alerts_states(spark, tmp_path, capsys):
    # hand-built samples parquet: host=a runs 2 consecutive steps (firing
    # at --for-steps 2), host=b only the last (pending)
    samples = spark.createDataFrame(
        [("m", {"host": "a"}, 1000, 1.0, 1),
         ("m", {"host": "a"}, 2000, 2.0, 2),
         ("m", {"host": "b"}, 2000, 3.0, 3)],
        "name string, labels map<string,string>, ts_ms long, "
        "value double, seq long",
    )
    src = str(tmp_path / "samples")
    samples.write.parquet(src)
    rc = cli.main(
        ["alerts", src, "m > 0", "--step", "1000",
         "--for-steps", "2", "--name", "Up"]
    )
    assert rc == 0
    out = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    got = {r["series_key"]: (r["state"], r["active_since_ms"]) for r in out}
    assert got == {"host=a": ("firing", 1000), "host=b": ("pending", 2000)}
    assert all(r["ts_ms"] == 2000 and r["alertname"] == "Up" for r in out)
