from dolphinbeat_spark.sinks.ordered import OrderedFileSink, read_with_consumer_dedup  # noqa: F401
