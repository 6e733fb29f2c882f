"""Query catalog. Importing this package populates the registry."""

from bigdata_riveranalysis_spark.plans.registry import REGISTRY, Query, oracle_sql_catalog, query, query_catalog  # noqa: F401

# Side-effect imports: each module registers its queries on import.
from bigdata_riveranalysis_spark.plans import relational  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import events  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import river  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import llmdata  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import traindata  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import scale  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import mining  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import sqlapi  # noqa: E402,F401
from bigdata_riveranalysis_spark.plans import streaming_queries  # noqa: E402,F401
