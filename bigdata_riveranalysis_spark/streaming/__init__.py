"""Structured Streaming layer (SURVEY.md §7 phase 2).

The reference's streaming job is a checkpoint-less Kafka→console
passthrough (reference streaming/spark_processor.py:28-50). The
engine lifts the same parse + the README's promised analytics onto
``readStream`` with the semantics the reference left undefined:

  * mandatory ``checkpointLocation`` on every sink (the reference's
    latest-offsets + no-checkpoint combination loses data on restart,
    SURVEY.md §3.1 step 3);
  * explicit late-data policy: event-time watermark, rows later than
    the watermark are dropped and the drop horizon is part of each
    job's signature (the reference never defined one, SURVEY.md §2b);
  * file/rate sources for tests, Kafka for deployment — the
    transformations are identical, only the source builder differs.
"""

from bigdata_riveranalysis_spark.streaming.sources import (
    file_json_stream,
    kafka_stream,
    rate_stream,
)
from bigdata_riveranalysis_spark.streaming.pipeline import (
    dedup_within_watermark,
    sessionized_activity,
    sliding_quality,
    windowed_quality,
)
from bigdata_riveranalysis_spark.streaming.sinks import (
    start_alert_sink,
    start_kafka_sink,
    start_parquet_sink,
)

__all__ = [
    "file_json_stream",
    "kafka_stream",
    "rate_stream",
    "windowed_quality",
    "sliding_quality",
    "sessionized_activity",
    "dedup_within_watermark",
    "start_parquet_sink",
    "start_alert_sink",
    "start_kafka_sink",
]
