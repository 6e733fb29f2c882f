from bigdata_riveranalysis_spark.functions import arrays, text, vectors  # noqa: F401
