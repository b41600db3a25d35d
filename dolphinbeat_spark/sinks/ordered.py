"""Ordered, sequence-numbered, exactly-once sink (reference K1/K2/K6/K7).

The reference preserves binlog total order by producing every op to a
single Kafka topic-partition with ``acks=all`` and a monotonically
increasing ``seq`` per producer; consumers dedup on seq gaps
(``sink/kafka/kafka.go:82-126,345-368``; client decoder seq-dedup
``sink/kafka/client/go/decoder.go:161-165``).

Spark restatement used here (SURVEY.md §7.2 step 4):

- ordering: within each micro-batch, sort by the TOTAL key
  (log_name, log_pos, op-type rank, row_index) — see
  :func:`total_order_cols` — and coalesce to ONE partition before
  writing; order only at the sink boundary, full parallelism upstream
  (§7.4 risk note).
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


def op_type_rank() -> "F.Column":
    """Explicit binlog-semantic rank for op types that could ever share
    a (log_name, log_pos): gtid/begin precede the row images, commit
    follows them, and a rotate ending a file at position P comes after
    everything that ended at P — never the accident of alphabetical
    order (which would sort 'commit' before 'insert')."""
    return (
        F.when(F.col("op_type") == "gtid", 1)
        .when(F.col("op_type") == "begin", 2)
        .when(F.col("op_type") == "commit", 4)
        .when(F.col("op_type") == "rotate", 5)
        .otherwise(3)  # insert/update/delete/query/ddl/ddl_failed
        .cast("int")
    )


def total_order_cols() -> list:
    """The TOTAL ordering every ordered sink stamps/sorts by. binlog
    coordinates alone are not total: the source emits one envelope op
    per row of a multi-row event, all sharing the event's log_pos
    (binlog_source.decode_event), so the per-event ``row_index``
    stamped at the source is the deterministic tiebreak; the op-type
    rank covers the cross-event tie a synthetic/fixture stream can
    produce."""
    return [
        F.col("log_name"),
        F.col("log_pos"),
        op_type_rank(),
        F.coalesce(F.col("row_index"), F.lit(0)),
    ]


class SeqStampedSink:
    """Shared discipline for every ordered sink: persisted per-batch
    base sequence (replay-stable) + total order inside one partition.

    ``meta_dir`` is the collapsed K6 recovery scan: instead of reading
    the topic tail backwards for the last committed seq
    (``sink/kafka/kafka.go:345-368``), the base/row-count of each batch
    id is committed to a tiny JSON next to the sink."""

    def __init__(self, meta_dir: str | Path, producer_id: int = 1) -> None:
        self.meta_dir = Path(meta_dir)
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

    #: retained per-batch meta files. Structured Streaming replays only
    #: the last uncommitted batch, so old metas exist purely to seed
    #: _base_seq's max — a bounded tail is sufficient and keeps the
    #: meta dir O(1) over a long-running stream.
    META_RETENTION = 100

    def _commit_meta(self, batch_id: int, base_seq: int, n_rows: int) -> None:
        tmp = self.meta_dir / f".{batch_id}.tmp"
        tmp.write_text(json.dumps({"base_seq": base_seq, "n_rows": n_rows}))
        os.replace(tmp, self.meta_dir / f"{batch_id}.json")
        metas = sorted(
            (p for p in self.meta_dir.glob("*.json")), key=lambda p: int(p.stem)
        )
        for p in metas[: -self.META_RETENTION]:
            p.unlink(missing_ok=True)

    def _stamped(self, batch_df: DataFrame, base: int) -> DataFrame:
        """Order by binlog coordinates (+ the row_index/op-rank
        tiebreaks that make it TOTAL), stamp seq + producer_id, and
        collapse to ONE partition — total order only at the sink
        boundary, full parallelism upstream (the reference pays the
        same single-partition price for total order, kafka.go:91-95)."""
        if "row_index" not in batch_df.columns:
            batch_df = batch_df.withColumn("row_index", F.lit(0))
        w = Window.orderBy(*total_order_cols())
        return (
            batch_df.withColumn(
                "seq", (F.row_number().over(w) + F.lit(base)).cast("bigint")
            )
            .withColumn("producer_id", F.lit(self.producer_id).cast("bigint"))
            .coalesce(1)
            .sortWithinPartitions("seq")
        )


class OrderedFileSink(SeqStampedSink):
    """foreachBatch writer: ordered + seq-stamped parquet per batch."""

    def __init__(self, out_dir: str, producer_id: int = 1) -> None:
        self.out_dir = Path(out_dir)
        super().__init__(self.out_dir / "_seq_meta", producer_id)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        base = self._base_seq(batch_id)
        ordered = self._stamped(batch_df, base)
        n = ordered.count()
        # overwrite per-batch path: replay-idempotent
        ordered.write.mode("overwrite").parquet(str(self.out_dir / f"batch={batch_id}"))
        self._commit_meta(batch_id, base, n)


def read_with_consumer_dedup(spark, out_dir: str) -> DataFrame:
    """Consumer-side contract (reference K7 / client decoder): read all
    batches, dedup on (producer_id, seq), return in seq order."""
    df = spark.read.parquet(f"{out_dir}/batch=*")
    return df.dropDuplicates(["producer_id", "seq"]).orderBy("producer_id", "seq")


def fragment_messages(payload: DataFrame, max_bytes: int) -> DataFrame:
    """K3/K4 parity: split any message value larger than ``max_bytes``
    into ordered fragments so no single Kafka message exceeds the
    broker limit — the reference's "unlimited event size" claim
    (``sink/kafka/kafka.go:109,114-116`` splits at ``max_payload_size``,
    default 1 MiB; fragments carry index/count for reassembly).

    Input: (key, value, partition) from :func:`kafka_batch_payload`.
    Output: same columns plus (frag_idx, n_frags); sub-message keys are
    ``<key>:<idx>/<n>`` so fragment ordering survives any transport
    that preserves per-partition order (ours does — single partition).
    Values at or under the limit pass through as their only fragment.
    Pure Catalyst (explode over an offset sequence) — no driver loop."""
    n_frags = F.ceil(F.length("value") / F.lit(max_bytes)).cast("int")
    n_frags = F.greatest(n_frags, F.lit(1))  # empty value -> one empty frag
    return (
        payload.withColumn("n_frags", n_frags)
        .withColumn("frag_idx", F.explode(F.sequence(F.lit(0), F.col("n_frags") - 1)))
        .select(
            F.concat(
                F.col("key").cast("string"), F.lit(":"),
                F.col("frag_idx").cast("string"), F.lit("/"),
                F.col("n_frags").cast("string"),
            ).cast("binary").alias("key"),
            F.substring(
                F.col("value"), F.col("frag_idx") * max_bytes + 1, max_bytes
            ).alias("value"),
            "partition",
            "frag_idx",
            "n_frags",
        )
    )


def defragment_messages(frags: DataFrame) -> DataFrame:
    """Consumer-side reassembly (reference client decoder's fragment
    merge): group fragments by their base key, order by frag_idx,
    binary-concat back to the original value. Tolerates duplicate
    fragment delivery (at-least-once) by keeping one copy per index."""
    base_key = F.split(F.col("key").cast("string"), ":").getItem(0)
    one_per_idx = (
        frags.select(base_key.alias("base_key"), "frag_idx", "value", "partition")
        .dropDuplicates(["base_key", "frag_idx"])
    )
    return (
        one_per_idx.groupBy("base_key")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("frag_idx", "value"))
                ),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["value"]),
            ).alias("value"),
            F.first("partition").alias("partition"),
        )
        .select(F.col("base_key").cast("binary").alias("key"), "value", "partition")
    )


def decode_kafka_messages(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Consumer-side decoder for the Kafka paths (the Spark analog of
    the reference's client library, ``sink/kafka/client/go/decoder.go``):
    parse the JSON message value back into the seq-stamped envelope,
    dedup on (producer_id, seq), return in seq order.

    ``messages`` is whatever carries the message bytes — a
    ``spark.read.format("kafka")`` DataFrame (binary ``value``), the
    fake producer's capture in tests, or a batch of
    :func:`kafka_batch_payload` output. Round-trip contract:
    payload → decode → the original stamped envelope rows, with
    at-least-once transport overlaps collapsed (K7)."""
    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA
    from pyspark.sql import types as T

    schema = T.StructType(
        list(ENVELOPE_SCHEMA.fields)
        + [
            T.StructField("seq", T.LongType()),
            T.StructField("producer_id", T.LongType()),
        ]
    )
    parsed = messages.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("m")
    ).select("m.*")
    return parsed.dropDuplicates(["producer_id", "seq"]).orderBy("producer_id", "seq")


def kafka_message_value(producer_id_col=None, seq_col=None) -> "F.Column":
    """The message envelope: every non-internal column JSON-packed plus
    (producer_id, seq) — the fields the reference's client decoder keys
    its dedup on (``sink/kafka/client/go/decoder.go:161-165``)."""
    return F.to_json(F.struct("*"))


class KafkaOrderedSink(SeqStampedSink):
    """The reference's Kafka path (``sink/kafka/kafka.go:82-126,
    280-343``): every op produced to ONE topic-partition in binlog
    order, seq in the message, delivery confirmed before the batch's
    seq metadata commits (acks=all + flush ≙ the reference's
    wait-for-ack loop).

    ``producer_factory() -> producer`` is injectable; the default
    builds a ``confluent_kafka.Producer`` with the idempotent-producer
    config. The produce loop runs DRIVER-side over the single ordered
    partition (total order is the contract; throughput bound is the
    same one the reference accepts, K1). A failed delivery raises →
    Structured Streaming retries the batch with the same id → the
    replay regenerates byte-identical messages and consumer seq-dedup
    (``read_with_consumer_dedup`` / K7) collapses the overlap:
    at-least-once transport + dedup = exactly-once."""

    def __init__(
        self,
        topic: str,
        bootstrap: str,
        meta_dir: str,
        producer_id: int = 1,
        partition: int = 0,
        producer_factory=None,
        poll_every: int = 1000,
    ):
        super().__init__(meta_dir, producer_id)
        self.topic, self.bootstrap, self.partition = topic, bootstrap, partition
        self._factory = producer_factory or (lambda: _confluent_producer(bootstrap))
        self.poll_every = poll_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        base = self._base_seq(batch_id)
        ordered = self._stamped(batch_df, base)
        payload = ordered.select(
            F.col("seq"),
            kafka_message_value().alias("value"),
        )
        producer = self._factory()
        errors: list = []
        n = 0
        # toLocalIterator over the single sorted partition preserves the
        # produce order (the reference's per-op produce loop,
        # kafka.go:280-343); poll() drains delivery callbacks in-flight
        for row in payload.toLocalIterator():
            producer.produce(
                topic=self.topic,
                partition=self.partition,
                key=str(row["seq"]).encode(),
                value=row["value"].encode(),
                on_delivery=lambda err, msg: errors.append(err) if err else None,
            )
            n += 1
            if n % self.poll_every == 0:
                producer.poll(0)
        producer.flush()
        if errors:
            raise RuntimeError(f"kafka delivery failed for {len(errors)} messages: {errors[0]}")
        self._commit_meta(batch_id, base, n)


def _confluent_producer(bootstrap: str):  # pragma: no cover - needs kafka client
    try:
        from confluent_kafka import Producer
    except ImportError as ex:
        raise ImportError(
            "KafkaOrderedSink requires confluent_kafka; use "
            "OrderedFileSink or kafka_writestream() (built-in Spark "
            "kafka format, no extra client) instead"
        ) from ex
    return Producer(
        {
            "bootstrap.servers": bootstrap,
            "enable.idempotence": True,  # broker-side producer dedup
            "acks": "all",
            "compression.type": "lz4",
        }
    )


def kafka_batch_payload(
    batch_df: DataFrame, batch_id: int, sink: SeqStampedSink, partition: int = 0
) -> DataFrame:
    """Zero-extra-dependency Kafka path: shape a batch for Spark's
    built-in ``kafka`` writer — columns (key, value, partition). The
    fixed ``partition`` column pins every message to one Kafka
    partition (the writer honors it), the single sorted Spark partition
    makes the one write task produce in seq order. Returns the payload
    DataFrame; the caller writes it with
    ``.write.format("kafka").option("kafka.bootstrap.servers", ...)``.
    """
    base = sink._base_seq(batch_id)
    ordered = sink._stamped(batch_df, base)
    return ordered.select(
        F.col("seq").cast("string").cast("binary").alias("key"),
        kafka_message_value().cast("binary").alias("value"),
        F.lit(partition).cast("int").alias("partition"),
    )


def pack_multirow_events(envelope: DataFrame) -> DataFrame:
    """Regroup the envelope's one-row-per-image ops back into ONE op
    per RowsEvent, carrying all images in a ``__rows`` array (ordered
    by the source-stamped row_index) — the reference producer's wire
    shape (one Operation per event, repeated ``Row rows = 14``,
    operation.go:33-73). Byte-level parity for multi-row
    INSERT/UPDATE/DELETE plus fewer repeated table defs on the wire.

    One groupBy on the event coordinates (a shuffle — the price of the
    packed shape; the default unpacked path stays shuffle-free until
    the K1 boundary). Non-row ops pass through unchanged."""
    row_ops = F.col("op_type").isin("insert", "update", "delete")
    rows = envelope.filter(row_ops)
    others = envelope.filter(~row_ops).withColumn(
        "__rows",
        F.lit(None).cast(
            "array<struct<row_index:int,"
            "before:map<string,string>,before_null:map<string,boolean>,"
            "after:map<string,string>,after_null:map<string,boolean>>>"
        ),
    )
    group_keys = [
        c for c in ("log_name", "log_pos", "op_type", "db", "table",
                    "server_id", "timestamp", "schema_version")
        if c in envelope.columns
    ]
    carried = [c for c in envelope.columns if c not in group_keys]
    packed = (
        rows.groupBy(*group_keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("row_index", "before", "before_null",
                             "after", "after_null")
                ),
                # explicit comparator on row_index: the default struct
                # ordering can't compare the map-typed image fields
                lambda a, b: F.when(a["row_index"] < b["row_index"], -1)
                .when(a["row_index"] > b["row_index"], 1)
                .otherwise(0),
            ).alias("__rows"),
            *[
                F.first(c).alias(c)
                for c in carried
                if c not in ("before", "before_null", "after", "after_null")
            ],
        )
        .withColumn("row_index", F.lit(0))
        .withColumn("before", F.lit(None).cast("map<string,string>"))
        .withColumn("before_null", F.lit(None).cast("map<string,boolean>"))
        .withColumn("after", F.lit(None).cast("map<string,string>"))
        .withColumn("after_null", F.lit(None).cast("map<string,boolean>"))
    )
    return others.unionByName(packed.select(*others.columns))


def encode_ops_distributed(envelope: DataFrame, registry) -> DataFrame:
    """Envelope rows → protobuf Payload chunks, Arrow-batched and
    distributed (``Payload``'s repeated field makes each op's tagged
    bytes independently encodable; the payload body is their plain
    concatenation). Sort keys ride along so the caller can impose the
    K1 total order AFTER the parallel encode."""
    import pandas as pd

    from dolphinbeat_spark.sinks import wire_protocol as wp

    row_ops = {"insert", "update", "delete"}

    def encode(batches):
        for pdf in batches:
            chunks = []
            for row in pdf.to_dict("records"):
                td = None
                if row["op_type"] in row_ops:
                    td = registry.get(
                        row.get("db"), row.get("table"),
                        wp.as_int(row.get("schema_version")) or None,
                    )
                chunks.append(wp.payload_chunk(wp.encode_operation(row, td)))
            yield pd.DataFrame(
                {
                    "log_name": pdf["log_name"],
                    "log_pos": pdf["log_pos"],
                    "op_type": pdf["op_type"],
                    "row_index": (
                        pdf["row_index"].fillna(0)
                        if "row_index" in pdf.columns
                        else 0
                    ),
                    "chunk": chunks,
                }
            )

    return envelope.mapInPandas(
        encode,
        schema=(
            "log_name string, log_pos long, op_type string, "
            "row_index int, chunk binary"
        ),
    )


def decode_protobuf_messages(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """The Spark restatement of the reference's kafka-consumer tool
    (``cmd/tools/kafka-consumer/main.go`` → client decoder): decode a
    DataFrame of protobuf Kafka message bytes back into operation rows.

    The decode chain (seq-successor dedup → fragment reassembly →
    zlib → Payload unmarshal) is inherently SEQUENTIAL per producer —
    that's the contract, not an implementation detail — so it runs as
    ``applyInPandas`` grouped by producer_id: one ordered chain per
    producer, parallel ACROSS producers (and trivially across topics
    when more grouping keys are added). A light map first extracts
    (producer_id, seq) from each message so the shuffle groups by the
    real producer key.

    Output: one row per decoded op with its message bookkeeping
    (producer_id, msg seq range via group end, op index within group).
    """
    import pandas as pd

    from dolphinbeat_spark.sinks import wire_protocol as wp

    def head(batches):
        for pdf in batches:
            out = {"producer_id": [], "seq": [], "value": []}
            for v in pdf[value_col]:
                raw = bytes(v)
                try:
                    h = wp.decode_message(raw)
                    out["producer_id"].append(h["producer_id"])
                    out["seq"].append(h["seq"])
                except Exception:  # noqa: BLE001 - unreadable envelope:
                    # route to the dead-letter producer group (-1); the
                    # decode stage emits it as an op_type='corrupt' row
                    # instead of the task crash-looping here
                    out["producer_id"].append(-1)
                    out["seq"].append(0)
                out["value"].append(raw)
            yield pd.DataFrame(out)

    headed = messages.mapInPandas(
        head, schema="producer_id long, seq long, value binary"
    )

    out_schema = (
        "producer_id long, end_seq long, op_index int, row_index int, "
        "op_type string, "
        "server_id long, timestamp long, log_pos long, gtid string, "
        "db string, table string, statement string, next_log_name string, "
        "progress_gset string, "
        "before map<string,string>, before_null map<string,boolean>, "
        "after map<string,string>, after_null map<string,boolean>"
    )

    def decode(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("seq")
        dec = wp.OperationDecoder()
        rows = []
        for _, r in pdf.iterrows():
            if int(r["producer_id"]) == -1:  # unreadable envelope (head)
                rows.append(
                    (-1, None, 0, 0)
                    + corrupt_row_tail(ValueError("unreadable Message envelope"), 0)
                )
                continue
            try:
                res = dec.feed(bytes(r["value"]))
            except Exception as ex:  # noqa: BLE001 - corrupt payload
                rows.append(
                    (int(r["producer_id"]), None, 0, 0)
                    + corrupt_row_tail(ex, int(r["seq"]))
                )
                continue
            if res is None:
                continue
            for i, op in enumerate(res.ops):
                for j, tail in enumerate(op_row_tails(op)):
                    rows.append((int(r["producer_id"]), res.end_seq, i, j) + tail)
        return pd.DataFrame(
            rows,
            columns=["producer_id", "end_seq", "op_index", "row_index"] + OP_TAIL_COLS,
        )

    return headed.groupBy("producer_id").applyInPandas(decode, out_schema)


#: decoded-op columns shared by the batch and streaming consumers
OP_TAIL_COLS = [
    "op_type", "server_id", "timestamp", "log_pos", "gtid", "db", "table",
    "statement", "next_log_name", "progress_gset",
    "before", "before_null", "after", "after_null",
]


def corrupt_row_tail(ex: Exception, pos: int) -> tuple:
    """Dead-letter row for a message the decode chain rejects
    (truncated varint, bad wiretype, zlib failure, mid-group jump):
    op_type='corrupt', the error in ``statement``, the transport
    coordinate in ``log_pos`` — the stream CONTINUES past it instead
    of crash-looping on one bad Kafka message. If the Message envelope
    itself parsed, the seq chain already advanced, so subsequent
    groups decode; an unreadable envelope can't advance the chain
    (strict like the reference) and the dead letter is the operator's
    signal to reset the consumer at a known seq."""
    return (
        "corrupt", None, None, pos, None, None, None,
        f"{type(ex).__name__}: {ex}", None, None,
        None, None, None, None,
    )


def op_row_tails(op: dict) -> list:
    """Flatten one decoded protobuf Operation into consumer row tails,
    ONE PER ROW IMAGE — the reference producer packs every row of a
    RowsEvent into a single Operation (operation.go:33-73, repeated
    ``Row rows = 14``), so a multi-row INSERT/UPDATE/DELETE must fan
    out here rather than truncate to the first image. Positional
    Column lists become the envelope's named image maps via the op's
    own TableDef column order (the reference's re-typing contract:
    consumers resolve positions through the embedded table def), so
    decoded ops feed typed_view/apply_changes directly. Ops with no
    rows (DDL, begin/commit, heartbeat) yield one tail with null
    images."""
    prog = op.get("progress") or {}
    table = op.get("table") or {}
    col_names = [c["name"] for c in table.get("columns", [])]
    head = (
        op["op_type"], op["server_id"], op["timestamp"], op["log_pos"],
        op.get("gtid"), table.get("database") or op.get("database"),
        table.get("name"), op.get("statement"), op.get("next_log_name"),
        prog.get("gset"),
    )
    rows = op.get("rows") or []
    if not rows:
        return [head + (None, None, None, None)]
    tails = []
    for row in rows:
        before = before_null = after = after_null = None
        if row.get("before"):
            before = {n: c["value"] for n, c in zip(col_names, row["before"])}
            before_null = {n: c["is_null"] for n, c in zip(col_names, row["before"])}
        if row.get("after"):
            after = {n: c["value"] for n, c in zip(col_names, row["after"])}
            after_null = {n: c["is_null"] for n, c in zip(col_names, row["after"])}
        tails.append(head + (before, before_null, after, after_null))
    return tails


class ProtobufKafkaSink(SeqStampedSink):
    """The reference's ACTUAL wire contract (K5/K7 drop-in): protobuf
    ``Message``/``Payload``/``Operation`` values with optional in-band
    zlib and IPv4-style fragmentation — a stock reference Go client
    (``sink/kafka/client/go/decoder.go``) can consume the topic.

    Differences from :class:`KafkaOrderedSink` (the JSON path): seq is
    per Kafka MESSAGE (fragment), not per op — exactly the reference's
    numbering (kafka.go:421-430) — and one message carries a Payload of
    up to ``ops_per_payload`` ops. Replay determinism is unchanged:
    same batch + same recorded base_seq → byte-identical messages, so
    at-least-once transport + client seq-dedup = exactly-once.

    ``produce(seq, value_bytes)`` is injectable (tests capture bytes;
    production wraps a kafka client's produce)."""

    def __init__(
        self,
        meta_dir: str,
        registry,
        produce,
        producer_id: int = 1,
        ops_per_payload: int = 128,
        max_payload_size: int = 1 << 20,
        compression: str = "none",
        pack_rows: bool = False,
    ):
        from dolphinbeat_spark.sinks import wire_protocol as wp

        super().__init__(meta_dir, producer_id)
        self.registry = registry
        self.produce = produce
        self.ops_per_payload = ops_per_payload
        self.max_payload_size = max_payload_size
        #: pack_rows=True regroups multi-row events into ONE Operation
        #: with repeated Row images — the reference producer's exact
        #: wire shape (operation.go:33-73); default False keeps the
        #: shuffle-free one-op-per-row path (both decode identically)
        self.pack_rows = pack_rows
        self.compression = {
            "none": wp.COMPRESSION_NONE, "zlib": wp.COMPRESSION_ZLIB,
            "gzip": wp.COMPRESSION_GZIP,
        }[compression]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from dolphinbeat_spark.sinks import wire_protocol as wp

        base = self._base_seq(batch_id)
        # encode in parallel FIRST (CPU-heavy part), then collapse only
        # the already-encoded bytes through the K1 single-partition
        # total-order boundary for the produce loop
        if self.pack_rows:
            batch_df = pack_multirow_events(batch_df)
        encoded = encode_ops_distributed(batch_df, self.registry)
        ordered = encoded.coalesce(1).sortWithinPartitions(*total_order_cols())
        chunks = [bytes(r["chunk"]) for r in ordered.toLocalIterator()]
        msgs = wp.build_messages(
            chunks,
            base,
            self.producer_id,
            ops_per_payload=self.ops_per_payload,
            max_payload_size=self.max_payload_size,
            compression=self.compression,
        )
        for seq, value in msgs:
            self.produce(seq, value)
        self._commit_meta(batch_id, base, len(msgs))


def kafka_writestream(
    stream: DataFrame,
    topic: str,
    bootstrap: str,
    checkpoint: str,
    meta_dir: str,
    producer_id: int = 1,
    partition: int = 0,
):
    """Streaming entry for the built-in-format path: foreachBatch
    shapes each batch via :func:`kafka_batch_payload` and writes it
    with Spark's own kafka sink (no client library needed), committing
    seq metadata after the write returns."""
    shaper = SeqStampedSink(meta_dir, producer_id)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        base = shaper._base_seq(batch_id)
        payload = kafka_batch_payload(batch_df, batch_id, shaper, partition)
        n = payload.count()
        (
            payload.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        )
        shaper._commit_meta(batch_id, base, n)

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
