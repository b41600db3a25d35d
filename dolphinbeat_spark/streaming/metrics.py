"""Streaming observability: the reference's metrics/status surface
(SURVEY.md §2.7 M1/M2) rebuilt on StreamingQueryListener.

The reference exposes Prometheus counters (trx_total, iud_total,
ddl_total — ``cmd/dolphinbeat/metrics.go:21-51``) and an HTTP /status.
Spark already streams the raw numbers through ``query.lastProgress``;
this module turns them into the same counter shape plus a pull-able
status snapshot, without any HTTP dependency (export is the caller's
concern — Prometheus client, JSON endpoint, logs).

``PipelineMetrics`` is additive across restarts of the same query name
(counters survive query re-creation, like a Prometheus counter would),
and tracks per-source input rates so back-pressure shows up as
batch_duration growth — the signal the reference's bounded channels
gave implicitly.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryStats:
    rows_total: int = 0
    batches_total: int = 0
    last_batch_rows: int = 0
    last_batch_seconds: float = 0.0
    last_input_rows_per_second: float = 0.0
    by_op: dict = field(default_factory=dict)  # op_type -> rows (if tracked)


class PipelineMetrics(StreamingQueryListener):
    """Collects counters per query name from progress events.

    Register with ``spark.streams.addListener(metrics)``; read
    ``metrics.status()`` anywhere (thread-safe snapshot)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: dict[str, QueryStats] = {}
        self._ops: dict[str, int] = {}  # op_type -> count (pipeline-wide)
        self._failed_ddl = 0

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        with self._lock:
            self._stats.setdefault(event.name or event.id, QueryStats())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        rows = int(p.numInputRows or 0)
        secs = float((p.batchDuration or 0)) / 1000.0
        with self._lock:
            s = self._stats.setdefault(name, QueryStats())
            s.rows_total += rows
            s.batches_total += 1
            s.last_batch_rows = rows
            s.last_batch_seconds = secs
            s.last_input_rows_per_second = float(p.inputRowsPerSecond or 0.0)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass  # counters intentionally survive (Prometheus semantics)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- pipeline-level op counters (reference metrics.go:21-51) ------------
    def record_ops(self, by_op: dict[str, int]) -> None:
        """Fold a batch's per-op-type counts into the pipeline counters
        (call from a foreachBatch consumer or the source dispatch) —
        these feed trx_total / iud_total / ddl_total."""
        with self._lock:
            for op, n in by_op.items():
                self._ops[op] = self._ops.get(op, 0) + int(n)

    def record_failed_ddl(self, n: int = 1) -> None:
        with self._lock:
            self._failed_ddl += n

    def counters(self, fallback_failed_ddl: int = 0) -> dict[str, int]:
        """The reference's four counter families. NOTE the reference
        has a copy-paste bug where iud_total and ddl_total both read
        TrxCount (cmd/dolphinbeat/metrics.go:35-44); here each counts
        its own op class. ``fallback_failed_ddl`` (e.g. a dead-letter
        queue length) stands in when no explicit failed-DDL increments
        were recorded."""
        with self._lock:
            iud = sum(self._ops.get(k, 0) for k in ("insert", "update", "delete"))
            failed = self._failed_ddl + self._ops.get("ddl_failed", 0)
            return {
                "trx_total": self._ops.get("commit", 0),
                "iud_total": iud,
                "ddl_total": self._ops.get("ddl", 0),
                "failed_ddl_total": failed or fallback_failed_ddl,
            }

    _HELP = {
        "trx_total": "Counter of trx handled by dolphinbeat.",
        "iud_total": "Counter of insert/update/delete events handled by dolphinbeat.",
        "ddl_total": "Counter of DDL handled by dolphinbeat.",
        "failed_ddl_total": "Counter of failed DDL.",
    }

    def prometheus_text(self, fallback_failed_ddl: int = 0) -> str:
        """Prometheus text exposition format (the scrape body served at
        /metrics, mirroring the reference's promhttp handler): the four
        reference counter families, plus per-query streaming counters
        labeled by query name."""
        lines: list[str] = []
        for name, value in self.counters(fallback_failed_ddl).items():
            lines.append(f"# HELP {name} {self._HELP[name]}")
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {value}")
        per_query = (
            ("dolphinbeat_query_rows_total", "counter", "rows_total",
             "Input rows per streaming query."),
            ("dolphinbeat_query_batches_total", "counter", "batches_total",
             "Micro-batches per streaming query."),
            ("dolphinbeat_query_last_batch_seconds", "gauge", "last_batch_seconds",
             "Duration of the last micro-batch."),
        )
        snap = self.status()
        for fam, typ, key, help_ in per_query:
            if not snap:
                continue
            lines.append(f"# HELP {fam} {help_}")
            lines.append(f"# TYPE {fam} {typ}")
            for qname, s in sorted(snap.items()):
                label = str(qname).replace("\\", r"\\").replace('"', r"\"")
                lines.append(f'{fam}{{query="{label}"}} {s[key]}')
        return "\n".join(lines) + "\n"

    # -- read side ----------------------------------------------------------
    def status(self) -> dict[str, dict]:
        """Point-in-time snapshot: {query_name: counters} — the
        /status analog."""
        with self._lock:
            return {
                name: {
                    "rows_total": s.rows_total,
                    "batches_total": s.batches_total,
                    "last_batch_rows": s.last_batch_rows,
                    "last_batch_seconds": s.last_batch_seconds,
                    "last_input_rows_per_second": s.last_input_rows_per_second,
                }
                for name, s in self._stats.items()
            }
