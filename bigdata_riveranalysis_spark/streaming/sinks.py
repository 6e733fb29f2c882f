"""Streaming sinks — every start_* function REQUIRES a checkpoint path.

The reference's console sink runs checkpoint-less
(streaming/spark_processor.py:43-47); combined with
``startingOffsets=latest`` a restart silently loses data. The engine
makes the checkpoint location a positional argument on every sink so
the unsafe configuration is unrepresentable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    output_mode: str = "append",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Columnar file sink (the Delta-on-MinIO intent the reference
    comments out, streaming/spark_processor.py:42, delivered as
    exactly-once parquet-on-filesystem via checkpointed file-sink
    commit log)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_alert_sink(
    df: DataFrame,
    checkpoint: str,
    handler: Callable[[DataFrame, int], None],
    *,
    output_mode: str = "update",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch alert dispatch (the MongoDB/Grafana serving path
    the reference provisions but never wires,
    Docker/docker-compose.yml:92-146). ``handler(batch_df, batch_id)``
    runs on the driver per micro-batch with a BATCH DataFrame — it may
    write to any batch sink; Spark retries the batch on failure, so
    the handler must be idempotent on ``batch_id``."""
    writer = (
        df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_upsert_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: tuple[str, ...],
    *,
    output_mode: str = "update",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Keyed upsert into a parquet serving table via foreachBatch —
    the MERGE-shaped sink for update-mode aggregations (latest value
    per key visible to readers, not an append log).

    Each micro-batch: read the current table, anti-join out the keys
    the batch replaces, union the batch, rewrite. Rewriting the whole
    table is correct here and fine for a *serving* table (these are
    small by construction — one row per key); a 100 TB-keyspace sink
    instead partitions the table by a key prefix and rewrites only
    the partitions the batch touches (same handler, plus dynamic
    partition overwrite), or targets a real MERGE sink (Delta/Iceberg).
    Idempotence: re-running a batch after a crash converges to the
    same table state because the upsert is keyed, not positional.
    The rewrite goes through a shadow directory + atomic swap (you
    cannot overwrite a parquet path that the same job is reading);
    on an object store the swap becomes a table-pointer flip, which
    is precisely what Delta/Iceberg commit logs formalize.

    Safety (two failure modes this sink explicitly defends against):

    * "First batch" is decided by an explicit path-existence check,
      never by catching a read/merge exception — a transient read or
      merge failure must FAIL the micro-batch (Spark retries it), not
      silently overwrite the serving table with only the current batch.
    * The swap is crash-safe: the old table is renamed aside, the new
      one moved in, and only then is the old one deleted. A crash at
      any point leaves either the old or the new table recoverable on
      disk; a crash between rename-aside and move-in is healed on the
      next batch by restoring the `__old` directory.
    """
    import os
    import shutil

    import glob as _glob

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(list(key_cols))
        tmp = f"{path}__b{batch_id}"
        old = f"{path}__old"
        # Heal a crash window from a previous batch: table missing but
        # the renamed-aside copy present -> restore it before merging.
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)
        # Sweep shadow dirs orphaned by a crash after tmp-write but
        # before the swap — over restarts with fresh checkpoints these
        # would otherwise accumulate next to the table (ADVICE r3).
        for stale in _glob.glob(_glob.escape(path) + "__b*"):
            if stale != tmp:
                shutil.rmtree(stale, ignore_errors=True)
        if os.path.exists(path):
            current = spark.read.parquet(path)
            merged = current.join(
                F.broadcast(batch.select(*key_cols)), list(key_cols), "left_anti"
            ).unionByName(batch)
        else:  # genuinely the first batch
            merged = batch
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_kafka_sink(
    df: DataFrame,
    checkpoint: str,
    *,
    bootstrap_servers: str,
    topic: str,
) -> StreamingQuery:
    """Kafka producer sink — the engine-native replacement for the
    reference's row-at-a-time Python producer loop
    (kafka/producer.py:35-47): every row JSON-encoded executor-side
    and produced in batched async sends. Frame construction shared
    with the batch publisher (sources.sinks.kafka_frames) so the
    broker-less wire-contract test covers both."""
    from bigdata_riveranalysis_spark.sources.sinks import kafka_frames

    return (
        kafka_frames(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
