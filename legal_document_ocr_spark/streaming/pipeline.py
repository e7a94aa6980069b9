"""Structured Streaming surface — incremental arrival as a stream.

The reference's nearest streaming concept is incremental HTTP upload arrival
(app/api/v1/endpoints/documents.py:16 — request/response batch, SURVEY.md
§2.12). The rebuild's streaming variant treats the pages/events table as an
append-only source:

- ``stream_windowed_counts`` — watermarked tumbling-window aggregation over
  the events table read as a file stream; event-time windows + late-data
  bound via ``withWatermark``. Run with ``availableNow`` it drains the
  current table exactly once and its result equals the batch
  ``relational.windowed_event_counts`` (that equivalence is the oracle).
- ``stream_extraction`` — the extraction pipeline inside ``foreachBatch``:
  every micro-batch runs the SAME batch stages (stages.run_extraction) and
  appends through the checkpoint store, so exactly-once comes from the sink's
  manifest commit, not from the streaming engine. This is the Iceberg
  incremental-scan pattern from SURVEY.md §2.12 with parquet standing in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA
from ..stages import run_extraction

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _as_stream_dir(spark: SparkSession, path: str) -> str:
    """Spark's file stream source requires a DIRECTORY; the driver testdata is
    one parquet file per table. Stage single files into a session-temp dir
    (hardlink when possible — no data copy) exactly once per path."""
    import os
    import tempfile

    if os.path.isdir(path):
        return path
    staged = os.path.join(
        tempfile.gettempdir(),
        "ldos-stream",
        path.strip("/").replace("/", "_"),
    )
    target = os.path.join(staged, os.path.basename(path))
    if not os.path.exists(target):
        os.makedirs(staged, exist_ok=True)
        try:
            os.link(path, target)
        except OSError:
            import shutil

            shutil.copyfile(path, target)
    return staged


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    *,
    bucket_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts per event_type (returns a streaming DF).

    Uses ``F.window`` (event-time) + watermark; output mode append-safe. The
    window start is projected to epoch seconds so results compare exactly with
    the batch/oracle formulation (floor(epoch/bucket)*bucket).
    """
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _as_stream_dir(spark, events_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{bucket_seconds} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_table(
    spark: SparkSession, streaming_df: DataFrame, table_name: str
) -> None:
    """Drain a streaming DF into an in-memory table with availableNow
    (exactly the rows present at start — the batch-equivalence harness)."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "first_event bigint, last_event bigint"
)
SESSION_STATE_SCHEMA = (
    "last_ts bigint, session_id bigint, n_events bigint, "
    "first_event bigint, last_event bigint"
)


def stream_sessionize(
    spark: SparkSession, events_dir: str, gap_seconds: int = 1800
):
    """Custom stateful streaming operator: per-user gap sessionization via
    ``applyInPandasWithState`` (SURVEY.md §2.12 — the stateful analogue of
    the batch gaps-and-islands in relational.sessionize_events).

    State per user = the OPEN session (last event time, running counters).
    A session CLOSES — and is emitted — when a later event arrives more than
    ``gap_seconds`` after the previous one; the final open session per user
    remains in state (it would emit on event-time timeout in a live stream).
    Emitted rows therefore equal the batch sessionization minus each user's
    last session — pinned by tests/test_streaming.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def sessionize_user(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        secs = rows["ts"].astype("int64") // 1_000_000_000  # floor epoch s
        (user_id,) = key
        if state.exists:
            last_ts, session_id, n, first_e, last_e = state.get
        else:
            last_ts, session_id, n, first_e, last_e = None, 0, 0, None, None
        out = []
        for ts, eid in zip(secs.tolist(), rows["event_id"].tolist()):
            if last_ts is None or ts - last_ts >= gap_seconds:
                if n:
                    out.append((user_id, session_id, n, first_e, last_e))
                session_id += 1
                n, first_e, last_e = 0, eid, eid
            n += 1
            first_e = min(first_e, eid)
            last_e = max(last_e, eid)
            last_ts = ts
        state.update((last_ts, session_id, n, first_e, last_e))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_id",
                    "n_events",
                    "first_event",
                    "last_event",
                ],
            )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _as_stream_dir(spark, events_dir)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        sessionize_user,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_extraction(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_store,
    *,
    max_files_per_trigger: int | None = None,
) -> "object":
    """Run the batch extraction pipeline over a pages file-stream.

    foreachBatch -> stages.run_extraction -> checkpoint_store.commit: each
    micro-batch is one manifest commit, so a crash between batches loses
    nothing and re-processing is prevented by the store's anti-join. Returns
    the StreamingQuery (caller awaits/stops).
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import uuid

        # resume filter FIRST (url anti-join, no UDF — cheap to test for
        # emptiness), so re-streaming an already-committed directory is a
        # no-op instead of an empty or colliding commit; run ids are unique
        # per micro-batch attempt (batch numbering restarts across queries)
        pending = checkpoint_store.filter_pending(batch_df)
        if not pending.limit(1).count():
            return
        result = run_extraction(pending)
        checkpoint_store.commit(
            result, run_id=f"stream-{batch_id:04d}-{uuid.uuid4().hex[:8]}"
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
