"""transformWithStateInPandas operators (Spark 4 arbitrary-state v2).

The successor API to applyInPandasWithState (streaming/state.py keeps
the v1 forms): typed state handles (ValueState/ListState/MapState),
explicit timers, and composable per-key processors. Port of the
consumer-side exactly-once dedup (reference K7) showing the v2 shape;
the v1 module remains the comparison point.

State discipline at scale is identical: O(1) ValueState per producer
(a seq high-watermark), never a seen-set.

Environment gate — and why it cannot be vendored away: executing
transformWithState requires (a) the RocksDB state store provider
(bundled) and (b) the ``google.protobuf`` python RUNTIME for its
state-server protocol. (b) is not satisfiable by hand-rolled message
encoding (the way sinks/wire_protocol.py hand-rolls proto3 wire
bytes): Spark imports its own generated
``pyspark.sql.streaming.proto.StateMessage_pb2``, whose generated code
needs the real runtime — ``descriptor_pool.Default().Add...``,
``internal.builder``, and a ``runtime_version.ValidateProtobufRuntimeVersion``
check pinned to the generator's protobuf release — i.e. vendoring
would mean reimplementing the protobuf runtime itself. The module
therefore stays import-clean; the processor LOGIC is exercised
directly (tests/test_state_ops.py::test_dedup_by_seq_v2_processor_unit)
and the end-to-end form runs wherever the package exists
(test_dedup_by_seq_v2_transform_with_state forks on availability —
no perpetual skip either way).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

DEDUP_OUT = StructType(
    [
        StructField("producer_id", LongType()),
        StructField("seq", LongType()),
        StructField("log_pos", LongType()),
    ]
)


class SeqDedupProcessor(StatefulProcessor):
    """Per-producer monotone-seq dedup with a ValueState watermark."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._max_seq = handle.getValueState(
            "max_seq", StructType([StructField("v", LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        max_seen = self._max_seq.get()[0] if self._max_seq.exists() else -1
        for pdf in rows:
            pdf = pdf.sort_values("seq").drop_duplicates("seq")
            fresh = pdf[pdf["seq"] > max_seen]
            if len(fresh):
                max_seen = int(fresh["seq"].max())
                yield fresh[["producer_id", "seq", "log_pos"]]
        self._max_seq.update((max_seen,))

    def close(self) -> None:
        pass


def dedup_by_seq_v2(stream: DataFrame) -> DataFrame:
    """Exactly-once consumer dedup — transformWithStateInPandas form
    of streaming/state.py::dedup_by_seq."""
    return stream.groupBy("producer_id").transformWithStateInPandas(
        statefulProcessor=SeqDedupProcessor(),
        outputStructType=DEDUP_OUT,
        outputMode="Append",
        timeMode="None",
    )
