from dolphinbeat_spark.sources.fixture_source import (  # noqa: F401
    FixtureDataSource,
    golden_envelope_df,
    register_fixture_source,
)
