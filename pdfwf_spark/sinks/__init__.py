"""Table sinks: Iceberg when available, parquet layout otherwise."""
