"""bigdata_riveranalysis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference river-water-quality
pipeline (Je-Tiev/BigData-RiverAnalysis), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required by the project charter.

Design stance (SURVEY.md §7):
  * DataFrame / SQL first — declare logical plans, let Catalyst +
    Tungsten choose physical strategy.
  * Explicit schemas, parquet columnar storage, UTC session timezone.
  * Zero row-at-a-time Python UDFs in hot paths; Pandas UDFs only
    where built-ins genuinely can't express the semantics.
  * Checkpointed streaming with defined watermark / late-data policy
    (the reference declared but never implemented this).
  * Every batch operator ships with a DuckDB-oracle SQL twin so the
    correctness harness can difference-test it.
"""

__version__ = "0.1.0"

from bigdata_riveranalysis_spark.session import get_spark  # noqa: F401
