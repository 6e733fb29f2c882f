from bigdata_riveranalysis_spark.operators import multimodal, river_pipeline  # noqa: F401
