from movies_etl_spark.functions import expr  # noqa: F401
