from dolphinbeat_spark.operators.asof import asof_join  # noqa: F401
from dolphinbeat_spark.operators.sessions import sessionize  # noqa: F401
