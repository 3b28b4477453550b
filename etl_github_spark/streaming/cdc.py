"""Change-data-capture apply: stream a (op, key, payload, seq) change
log into the lakehouse table with exactly-once semantics.

`stream_merge_sink` handles the upsert-only world; real CDC feeds
(Debezium-shaped) also carry DELETES and per-key ordering, and applying
them naively breaks in three ways this module exists to prevent:

* intra-batch ordering — a batch may hold I→U→D for one key; only the
  LATEST op per key (by the monotone ``seq``) may apply, and an earlier
  update must never resurrect a later delete;
* delete semantics — a tombstone must remove the row (and a tombstone
  for an absent key is a no-op, not an error);
* redelivery — the checkpoint re-hands a crashed batch to
  ``foreachBatch``; merge and delete are both idempotent under re-apply,
  so at-least-once delivery still yields exactly-once table state.

Scale shape: each micro-batch collapses to one row per key (window over
the batch, which is small by definition), then applies one
partition-pruned COW merge (`io/sink.merge_table`) and one
partition-pruned COW delete (`io/sink.delete_rows`) — cost bounded by
the partitions the batch touches, never the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..io.sink import delete_rows, merge_table

#: change-log op codes (Debezium-style: create/update collapse to upsert)
UPSERT_OPS = ("I", "U")
DELETE_OP = "D"


def apply_cdc_batch(
    batch_df: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
    partition_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """Apply one change-log batch to the table at ``path``.

    Collapses to the latest op per key, then deletes tombstoned keys
    and merges surviving upserts (payload columns = everything except
    the op/seq bookkeeping). Idempotent: re-applying the same batch
    leaves the table unchanged.
    """
    if not batch_df.columns:
        return
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    latest = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    ups = latest.where(F.col(op_col).isin(*UPSERT_OPS)).drop(op_col, seq_col)
    dels = latest.where(F.col(op_col) == DELETE_OP).select(
        *key_cols, partition_col
    )
    spark = batch_df.sparkSession
    exists = os.path.isdir(path) and any(
        not e.startswith("_") for e in os.listdir(path)
    )
    if not exists:
        # first batch bootstraps the table from the upserts alone
        # (overwrite, not errorifexists: a crashed first attempt may
        # have left an artifact-only dir — same rule as stream_merge_sink)
        ups.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return
    if dels.limit(1).count() > 0:
        delete_rows(spark, path, dels, key_cols, partition_col)
    if ups.limit(1).count() > 0:
        merge_table(spark, path, ups, key_cols, partition_col)


def stream_cdc_apply(
    changes: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...],
    partition_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> StreamingQuery:
    """Run the change-log stream into the table via ``foreachBatch``.

    ``Trigger.AvailableNow`` drains the backlog then stops — the same
    backfill-then-steady-state contract as the ingest pipeline; a
    long-lived deployment swaps in a processing-time trigger unchanged.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            batch_df, path, key_cols, partition_col, seq_col=seq_col, op_col=op_col
        )

    return (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
