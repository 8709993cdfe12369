"""Sources & sinks (SURVEY.md §2.1)."""

from etl_aws_spark.sources.readers import read_table  # noqa: F401
