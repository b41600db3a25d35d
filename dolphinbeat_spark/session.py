"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the conf is written so the same
code scales to a multi-executor cluster: AQE on (runtime coalesce +
skew-join handling), shuffle partitions sized by env, Arrow enabled for
the few Pandas-UDF paths, UTC session timezone so timestamp semantics
match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dolphinbeat_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Scale notes: nothing here is local-mode-only. On a real cluster the
    same settings apply; ``spark.sql.shuffle.partitions`` should be
    raised to ~2-3x total cores (AQE coalesces the excess), and
    ``maxPartitionBytes`` keeps scan tasks ~128MB so a 100 TB input
    splits into ~800k well-sized tasks.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 default, pinned explicitly (r17, ADVICE): the
        # long-cents/limb money aggregation's soundness net is
        # raise-on-int64-overflow; a cluster profile that disables ANSI
        # would otherwise silently wrap money sums past the documented
        # headroom instead of failing loudly.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects;
        # read as long, catalog.load converts to micros TimestampType
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # shuffle/spill codec, env-parameterised for A/B (r17, guide
        # §2.3): default stays Spark's lz4; the sf100-replica A/B is
        # recorded in OPTIMIZATION_r17.md — on a network-bound cluster
        # set SPARK_GRAFT_IO_CODEC=zstd and re-measure there.
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
        .config("spark.ui.enabled", "false")
        # 24g measured AGAINST 64g at r16: steady-state q1 sf100
        # walls were 23-27 s at 24g vs 56-60 s at 64g on clean
        # steal-stamped windows (BASELINE §r16 A/B) — the bigger
        # heap ran the same plans ~2x slower (young-gen/L3
        # locality), so the spill margin 64g buys is a bad trade on
        # this host. On a real cluster this is per-executor memory
        # sizing; re-measure, don't assume bigger is better.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # shuffle/spill IO goes to tmpfs when available (the local-mode
    # analog of cluster NVMe local dirs): the r16 probe columns
    # showed spill volume varying 2.9 MB -> 895 MB run-to-run on the
    # variable-throughput cloud boot disk; tmpfs removes that device
    # from the variance equation (it did NOT remove the variance —
    # see BASELINE §r16 — but it is strictly faster and makes the
    # remaining walls attributable to compute, not the disk)
    # Runtime Bloom-filter join pre-filtering (r17, guide §3.2),
    # measured at the sf100 replica (OPTIMIZATION_r17.md "VERDICT #3"):
    # with these thresholds the optimizer injects might_contain() on
    # the probe side of q3/q5/q21's lineitem⋈orders shuffle joins,
    # cutting shuffle rows to 30.6% (q5) / 3.0% (q3) of lineitem.
    # Local walls are PARITY (shuffle is tmpfs-local, so the saved
    # bytes cost nothing here and the creation-side second pass eats
    # the gain) — that is why the default is off and the driver bench
    # stays on identical plans. On a real cluster, where those bytes
    # cross the network, set SPARK_GRAFT_BLOOM=1; size
    # expectedNumItems to the creation side's post-filter key
    # cardinality (values below fit the ~5M-key replica creation side
    # at <1% false-positive rate; 64Mbit filter = 8 MB broadcast).
    if os.environ.get("SPARK_GRAFT_BLOOM") == "1":
        builder = (
            builder
            .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
            .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "256MB")
            .config("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "8000000")
            .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "16000000")
            .config("spark.sql.optimizer.runtime.bloomFilter.numBits", "67108864")
        )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark_graft_local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
