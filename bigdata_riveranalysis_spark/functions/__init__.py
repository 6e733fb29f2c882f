from bigdata_riveranalysis_spark.functions import text, vectors  # noqa: F401
