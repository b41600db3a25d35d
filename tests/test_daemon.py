"""Daemon config surface tests (reference cmd/dolphinbeat/config.go
shape): TOML parse, validation errors, resolved plan, CLI dry-run."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from dolphinbeat_spark.daemon import DaemonConfig, resolve_plan, source_options

SAMPLE = Path(__file__).resolve().parent.parent / "dolphinbeat_spark" / "dolphinbeat.toml.sample"


def test_sample_config_parses_and_validates():
    cfg = DaemonConfig.from_toml(SAMPLE)
    assert cfg.mysql_addr == "127.0.0.1:3306"
    assert cfg.server_id == 1001
    assert cfg.flavor == "mysql" and cfg.gtid_enabled
    assert [s.name for s in cfg.sinks] == ["audit_files", "main_topic"]
    assert cfg.sinks[1].cfg["compression"] == "zlib"
    assert cfg.validate() == []


def test_resolved_plan_maps_reference_keys():
    cfg = DaemonConfig.from_toml(SAMPLE)
    plan = resolve_plan(cfg)
    assert plan["source"]["mode"] == "single-reader"
    opts = plan["source"]["options"]
    assert opts["host"] == "127.0.0.1" and opts["port"] == "3306"
    assert opts["server_id"] == "1001"
    kafka = next(s for s in plan["sinks"] if s["type"] == "kafka")
    assert kafka["bootstrap"] == "127.0.0.1:9092"
    assert kafka["topic"] == "my_topic"
    assert kafka["encoder"] == "protobuf"
    assert kafka["max_payload_size"] == 1 << 20
    # include/exclude regexes flow through to the sink spec (F1/F2)
    assert kafka["exclude"] == ["test\\.scratch_.*"]
    # per-sink checkpoint under [checkpoint] dir
    assert kafka["checkpoint"].endswith("ckp/main_topic")


def test_shard_count_selects_sharded_mode(tmp_path):
    text = SAMPLE.read_text().replace("shard_count = 0", "shard_count = 4")
    p = tmp_path / "c.toml"
    p.write_text(text)
    plan = resolve_plan(DaemonConfig.from_toml(p))
    assert plan["source"] == {**plan["source"], "mode": "sharded-by-table", "readers": 4}


def test_validation_errors(tmp_path):
    bad = SAMPLE.read_text().replace('flavor = "mysql"', 'flavor = "postgres"')
    bad = bad.replace('type = "stdout"', 'type = "mystery"')
    bad += '\n[election]\n  enabled = true\n'
    p = tmp_path / "bad.toml"
    p.write_text(bad)
    errors = DaemonConfig.from_toml(p).validate()
    joined = "\n".join(errors)
    assert "flavor" in joined
    assert "unknown type 'mystery'" in joined
    assert "[election]" in joined and "cluster manager" in joined
    # kafka block missing broker_list/topic also rejects
    nok = SAMPLE.read_text().replace('broker_list = "127.0.0.1:9092"', "")
    p2 = tmp_path / "nok.toml"
    p2.write_text(nok)
    assert any("broker_list" in e for e in DaemonConfig.from_toml(p2).validate())
    # malformed http addr is a CONFIG error (caught at review, not at
    # startup after the queries are already running)
    noport = SAMPLE.read_text().replace('addr = "127.0.0.1:8080"', 'addr = "127.0.0.1"')
    p3 = tmp_path / "noport.toml"
    p3.write_text(noport)
    assert any("host:port" in e for e in DaemonConfig.from_toml(p3).validate())


def test_gtid_enabled_flows_to_source_options(tmp_path):
    off = SAMPLE.read_text().replace("gtid_enabled = true", "gtid_enabled = false")
    p = tmp_path / "off.toml"
    p.write_text(off)
    assert source_options(DaemonConfig.from_toml(p))["gtid_enabled"] == "false"
    assert source_options(DaemonConfig.from_toml(SAMPLE))["gtid_enabled"] == "true"


def test_daemon_run_end_to_end_on_fake_binlog(spark, tmp_path):
    """run() drives the EXACT runtime wiring — sharded-or-single
    source, fan-out file sinks, once-only metrics, control server —
    against the scripted fake-binlog source; only the MySQL socket
    goes unexecuted."""
    import urllib.request

    from dolphinbeat_spark.daemon import run
    from dolphinbeat_spark.sources.binlog_fake import register_fake_binlog_source

    register_fake_binlog_source(spark)
    toml = f"""
mysql_addr = "127.0.0.1:3306"
server_id = 77
[checkpoint]
  dir = "{tmp_path}/ckp"
[schema_tracker]
  dir = "{tmp_path}/schema"
[http_server]
  addr = "127.0.0.1:0"
[[sink]]
  enabled = true
  type = "stdout"
  name = "all"
  [sink.cfg]
    out_dir = "{tmp_path}/out/all"
[[sink]]
  enabled = true
  type = "stdout"
  name = "fake_only"
  include_table = ["test\\\\.fake_t"]
  [sink.cfg]
    out_dir = "{tmp_path}/out/fake_only"
"""
    p = tmp_path / "daemon.toml"
    p.write_text(toml)
    cfg = DaemonConfig.from_toml(p)
    assert cfg.validate() == []
    sparksess, queries, server = run(
        cfg, spark,
        source_format="dolphinbeat_binlog_fake",
        source_options_extra={"schema_snapshot": "", "n_trx": "6",
                              "rows_per_trx": "3",
                              # explicit start position: no live
                              # master to probe in the sandbox
                              "file": "binlog.000001", "pos": "4"},
        trigger_once=True,
    )
    try:
        for q in queries:
            q.awaitTermination(120)
        all_ops = spark.read.parquet(f"{tmp_path}/out/all/batch=*")
        by_op = {r["op_type"]: r["n"] for r in
                 all_ops.groupBy("op_type").count()
                 .withColumnRenamed("count", "n").collect()}
        assert by_op["insert"] == 18 and by_op["commit"] == 6
        assert by_op["ddl"] == 1
        # per-sink include filter applied: all 18 row ops are
        # test.fake_t (control markers pass through by design, F2)
        fake_only = spark.read.parquet(f"{tmp_path}/out/fake_only/batch=*")
        rows_only = fake_only.filter("op_type in ('insert','update','delete')")
        assert rows_only.count() == 18
        assert rows_only.filter("table <> 'fake_t'").count() == 0

        # daemon-level counters: counted ONCE despite two sinks
        # (run() starts the dedicated metrics query)
        from dolphinbeat_spark.streaming.metrics import PipelineMetrics

        # the metrics listener instance is attached inside run(); read
        # through the control server instead (the operator's view)
        port = server._httpd.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5
        ) as r:
            text = r.read().decode()
        metrics = {
            parts[0]: float(parts[1])
            for parts in (ln.split() for ln in text.splitlines()
                          if ln and not ln.startswith("#"))
            if len(parts) == 2 and "{" not in parts[0]
        }
        assert metrics["trx_total"] == 6
        assert metrics["iud_total"] == 18
        assert metrics["ddl_total"] == 1
    finally:
        if server:
            server.stop()


def test_cli_dry_run_prints_plan():
    out = subprocess.run(
        [sys.executable, "-m", "dolphinbeat_spark", "daemon",
         "--config", str(SAMPLE), "--dry-run"],
        capture_output=True, text=True, timeout=120,
        cwd=str(SAMPLE.parent.parent),
    )
    assert out.returncode == 0, out.stderr
    plan = json.loads(out.stdout)
    assert {s["name"] for s in plan["sinks"]} == {"audit_files", "main_topic"}
    assert plan["http"]["addr"] == "127.0.0.1:8080"


def test_cli_dry_run_rejects_bad_config(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text(SAMPLE.read_text() + '\n[election]\n  enabled = true\n')
    out = subprocess.run(
        [sys.executable, "-m", "dolphinbeat_spark", "daemon",
         "--config", str(p), "--dry-run"],
        capture_output=True, text=True, timeout=120,
        cwd=str(SAMPLE.parent.parent),
    )
    assert out.returncode == 1
    assert "config error" in out.stderr


def test_daemon_run_with_arrow_reader(spark, tmp_path):
    """reader = "arrow" in the TOML routes the daemon through the
    executor-side Arrow source (one stream, shard partitions inside)
    — same sink outputs as the simple-reader wiring."""
    from dolphinbeat_spark.daemon import run
    from dolphinbeat_spark.sources.binlog_fake import (
        register_fake_arrow_binlog_source,
    )

    register_fake_arrow_binlog_source(spark)
    toml = f"""
mysql_addr = "127.0.0.1:3306"
server_id = 78
reader = "arrow"
shard_count = 3
[checkpoint]
  dir = "{tmp_path}/ckp"
[schema_tracker]
  dir = "{tmp_path}/schema"
[[sink]]
  enabled = true
  type = "stdout"
  name = "all"
  [sink.cfg]
    out_dir = "{tmp_path}/out/all"
"""
    p = tmp_path / "daemon.toml"
    p.write_text(toml)
    cfg = DaemonConfig.from_toml(p)
    assert cfg.validate() == []
    from dolphinbeat_spark.daemon import resolve_plan

    plan = resolve_plan(cfg)
    assert plan["source"]["mode"] == "arrow-executor-shards(3)"
    assert plan["source"]["readers"] == 1  # one stream, N executor tasks

    _, queries, server = run(
        cfg, spark,
        source_format="dolphinbeat_binlog_fake_arrow",
        source_options_extra={"schema_snapshot": "", "n_trx": "5",
                              "rows_per_trx": "4"},
        trigger_once=True,
    )
    try:
        for q in queries:
            q.awaitTermination(120)
        all_ops = spark.read.parquet(f"{tmp_path}/out/all/batch=*")
        by_op = {r["op_type"]: r["n"] for r in
                 all_ops.groupBy("op_type").count()
                 .withColumnRenamed("count", "n").collect()}
        # control ops once (shard 0), 20 inserts exactly once
        assert by_op["insert"] == 20 and by_op["commit"] == 5
        assert by_op["ddl"] == 1 and by_op["rotate"] == 1
    finally:
        if server:
            server.stop()
        for q in queries:
            q.stop()


def test_daemon_file_reader_backfill(spark, tmp_path):
    """reader = 'file': the daemon replays an archived binlog through
    the full pipeline wiring (source registration, per-sink filters,
    checkpoints) — the backfill deployment shape, no socket anywhere."""
    from pathlib import Path as P

    from dolphinbeat_spark.daemon import DaemonConfig, SinkBlock, resolve_plan, run

    fixture = P(__file__).parent / "fixtures" / "replay.binlog"
    cfg = DaemonConfig(
        reader="file",
        binlog_file_path=str(fixture),
        checkpoint_dir=str(tmp_path / "ckp"),
        tracker_dir=str(tmp_path / "schema"),
        sinks=[
            SinkBlock(type="stdout", name="all", enabled=True,
                      cfg={"out_dir": str(tmp_path / "out")}),
        ],
    )
    assert cfg.validate() == []
    plan = resolve_plan(cfg)
    assert plan["source"]["mode"].startswith("file-replay(")
    assert plan["source"]["readers"] == 1
    spark_, queries, server = run(cfg, spark=spark, trigger_once=True)
    for q in queries:
        q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out" / "batch=*"))
    ops = {r["op_type"] for r in out.select("op_type").distinct().collect()}
    assert {"insert", "update", "delete", "ddl"} <= ops
    assert out.count() >= 16
    if server:
        server.stop()


def test_daemon_file_reader_validation():
    from dolphinbeat_spark.daemon import DaemonConfig

    assert any("binlog_file_path" in e
               for e in DaemonConfig(reader="file").validate())
    assert any("only valid" in e
               for e in DaemonConfig(binlog_file_path="/x").validate())


def test_dry_run_prints_probe_plan(tmp_path, capsys):
    """--dry-run surfaces the startup probe sequence (RUNBOOK.md §2):
    ROW-format assert, master-position probe, retention check, start
    mode — and the file reader (no socket) plans no probes."""
    import json

    from dolphinbeat_spark.daemon import DaemonConfig, main, resolve_plan

    cfg = tmp_path / "d.toml"
    cfg.write_text(
        'mysql_addr = "127.0.0.1:3306"\nserver_id = 9\n'
        '[[sink]]\ntype = "stdout"\nname = "s"\n'
    )
    assert main(["daemon", "--config", str(cfg), "--dry-run"][1:]) == 0
    plan = json.loads(capsys.readouterr().out)
    probes = {p["probe"] for p in plan["probes"]}
    assert {"row-format assert", "master position",
            "retention / resumability", "start mode"} <= probes
    row = next(p for p in plan["probes"] if p["probe"] == "row-format assert")
    assert row["requires"] == "ROW"
    mode = next(p for p in plan["probes"] if p["probe"] == "start mode")
    assert "auto_position" in mode["resolved"]

    # gtid off -> file/pos resume; file reader -> no socket, no probes
    fc = DaemonConfig(reader="file", binlog_file_path="x.binlog")
    assert resolve_plan(fc)["probes"] == []
    gc = DaemonConfig(gtid_enabled=False)
    mode = next(p for p in resolve_plan(gc)["probes"] if p["probe"] == "start mode")
    assert "file/pos" in mode["resolved"]
