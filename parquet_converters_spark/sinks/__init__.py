from parquet_converters_spark.sinks.parquet_sink import write_canonical_parquet  # noqa: F401
from parquet_converters_spark.sinks.sonata import SonataBundleWriter, write_sonata_bundle  # noqa: F401
