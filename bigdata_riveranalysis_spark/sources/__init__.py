from bigdata_riveranalysis_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
