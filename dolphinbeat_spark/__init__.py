"""dolphinbeat_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
CDC router (bytewatch/dolphinbeat: MySQL binlog → schema-tracked row
changes → filtered/ordered fan-out to sinks), re-expressed Spark-first:

- change-event **envelope** DataFrames (``dolphinbeat_spark.envelope``)
- include/exclude **table filters** (``operators.filters``; reference
  ``canal/canal.go:116-141``)
- versioned **schema registry** with DDL replay (``schema.registry``;
  reference ``schema/tracker.go``)
- ordered, sequence-numbered **sinks** (``sinks``; reference
  ``sink/kafka/kafka.go``)
- Structured Streaming **pipeline** with checkpoint-based resume
  (``streaming``; replaces reference ``ckp/``)

plus the large-scale analytics layer the driver's north star asks for
(absent in the reference — SURVEY.md §2.8): relational query operators,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, as-of & range
joins, event-time windowing.

Everything is DataFrame/Catalyst-first; Python UDFs appear only where
built-ins genuinely cannot express the semantics (Arrow-batched).
"""

__version__ = "0.1.0"

from dolphinbeat_spark.session import get_spark  # noqa: F401
