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
