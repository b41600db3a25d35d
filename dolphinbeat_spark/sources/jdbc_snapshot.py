"""JDBC snapshot bootstrap (reference S1-S3/S5).

The reference forks ``mysqldump --no-data --master-data
--single-transaction`` to bootstrap the schema mirror + a consistent
start position, and deliberately discards the data rows
(``canal/dump.go:64-69``). Spark-side the same bootstrap is three
declarative reads — no text parsing (S2 disappears):

1. schemas:  INFORMATION_SCHEMA.COLUMNS via spark.read.jdbc
2. position: SHOW MASTER STATUS / @@GLOBAL.GTID_EXECUTED (one-row)
3. optional real data backfill (improvement over the reference):
   partitioned parallel JDBC scan per table.

No MySQL exists in this environment; the functions below build the
reader configs (pure, unit-testable) and execute only when given a
real JDBC URL.
"""

from __future__ import annotations

from dataclasses import dataclass

from dolphinbeat_spark.schema.registry import ColumnDef, SchemaRegistry, TableDef

_COLUMNS_QUERY = """
(SELECT table_schema, table_name, column_name, ordinal_position,
        column_type, is_nullable, column_key, character_set_name
 FROM information_schema.columns
 WHERE table_schema NOT IN ('mysql','sys','information_schema','performance_schema')
) AS cols
"""


@dataclass(frozen=True)
class BackfillPlan:
    """Partitioned-read plan for one table (S3 done properly)."""

    table: str
    partition_column: str | None
    num_partitions: int
    lower_bound: int | None = None
    upper_bound: int | None = None

    def reader_options(self, url: str, user: str, password: str) -> dict:
        opts = {
            "url": url,
            "dbtable": self.table,
            "user": user,
            "password": password,
            "fetchsize": "10000",
        }
        if self.partition_column:
            opts.update(
                partitionColumn=self.partition_column,
                numPartitions=str(self.num_partitions),
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
            )
        return opts


def snapshot_schemas(spark, url: str, user: str, password: str) -> SchemaRegistry:
    """Seed a SchemaRegistry from INFORMATION_SCHEMA (no mysqldump)."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", _COLUMNS_QUERY)
        .option("user", user)
        .option("password", password)
        .load()
    )
    return registry_from_columns_rows(
        [
            (
                r["table_schema"],
                r["table_name"],
                r["column_name"],
                int(r["ordinal_position"]),
                r["column_type"],
                r["is_nullable"],
                r["column_key"],
                r["character_set_name"],
            )
            for r in df.collect()
        ]
    )


def registry_from_columns_rows(rows: list[tuple]) -> SchemaRegistry:
    """Pure assembly of the registry from INFORMATION_SCHEMA tuples
    (schema, table, column, ordinal, type, nullable, key, charset)."""
    reg = SchemaRegistry()
    tables: dict[tuple[str, str], list[tuple[int, ColumnDef]]] = {}
    for db, tbl, col, ordinal, ctype, nullable, key, charset in rows:
        ct = ctype.lower()
        tables.setdefault((db, tbl), []).append(
            (
                ordinal,
                ColumnDef(
                    name=col,
                    type=ct.replace(" unsigned", ""),
                    nullable=(str(nullable).upper() == "YES"),
                    unsigned="unsigned" in ct,
                    key=(key or "").upper()[:3],
                    charset=charset or "",
                ),
            )
        )
    for (db, tbl), cols in sorted(tables.items()):
        td = TableDef(database=db, name=tbl, columns=[c for _, c in sorted(cols, key=lambda t: t[0])])
        reg._bump(db, tbl, td)  # seeding is a registry-internal bulk load
    return reg


def bootstrap_handover(run_query, columns_rows: list[tuple]):
    """Snapshot→stream handover (the reference's dump→sync switch,
    ``canal/canal.go`` Run: dump bootstraps schema + position, sync
    continues from that position).

    ORDER MATTERS: the master position is probed BEFORE the schema
    snapshot is read. Any DDL that commits between the probe and the
    INFORMATION_SCHEMA read is then seen TWICE — once already folded
    into the snapshot, once replayed from the binlog — and the
    registry's position-keyed idempotence would not catch it (the
    snapshot carries no positions). That duplicate replay is safe for
    the grammar here (re-CREATE bumps a version with the same def;
    consumers resolve by version), whereas the opposite order would
    LOSE any DDL committed between snapshot and probe — a silent
    schema hole. Probe-first is the conservative side.

    ``run_query`` is the S5 injectable; ``columns_rows`` are
    INFORMATION_SCHEMA tuples (from ``snapshot_schemas``'s JDBC read,
    or any other transport). Returns ``(registry, start_offset)`` —
    feed both to ``LiveBinlogStreamReader`` (registry via
    ``schema_snapshot``, offset via ``file``/``pos``/``gtid_set``).
    """
    from dolphinbeat_spark.sources.binlog_source import probe_master_offset

    offset = probe_master_offset(run_query)
    registry = registry_from_columns_rows(columns_rows)
    return registry, offset
