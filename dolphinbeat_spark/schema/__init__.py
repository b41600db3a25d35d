from dolphinbeat_spark.schema.registry import ColumnDef, SchemaRegistry, TableDef  # noqa: F401
