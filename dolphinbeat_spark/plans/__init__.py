from dolphinbeat_spark.plans.registry import QuerySpec, all_specs, register  # noqa: F401
