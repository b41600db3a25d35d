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
