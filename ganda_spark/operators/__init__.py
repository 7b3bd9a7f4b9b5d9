from ganda_spark.operators.fetch import mock_fetch_plan, mock_fetch_udf  # noqa: F401
