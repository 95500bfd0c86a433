"""Custom source connectors built on Spark 4's public Python DataSource API
(`pyspark.sql.datasource`) — the extension point for reading systems Spark
has no built-in connector for, with partition-parallel batch reads and
offset-tracked streaming reads."""
