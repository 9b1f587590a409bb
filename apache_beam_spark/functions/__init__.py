from apache_beam_spark.functions import text, vectors  # noqa: F401
