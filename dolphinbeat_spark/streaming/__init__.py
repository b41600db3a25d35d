from dolphinbeat_spark.streaming.pipeline import SinkSpec, build_pipeline  # noqa: F401
