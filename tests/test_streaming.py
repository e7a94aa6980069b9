"""Streaming surface: foreachBatch extraction + windowed aggregation."""

from __future__ import annotations

from legal_document_ocr_spark.scale.checkpoint import CheckpointStore
from legal_document_ocr_spark.sources.pages import fixture_pages_df
from legal_document_ocr_spark.stages import run_extraction
from legal_document_ocr_spark.streaming.pipeline import (
    stream_extraction,
    stream_windowed_counts,
    run_stream_to_table,
)


def test_stream_extraction_equals_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    fixture_pages_df(spark).write.parquet(pages_dir)
    store = CheckpointStore(str(tmp_path / "ckpt"))

    q = stream_extraction(spark, pages_dir, store)
    q.awaitTermination()

    streamed = store.read_results(spark)
    batch = run_extraction(spark.read.parquet(pages_dir))
    s_rows = {
        r["url"]: r["extracted_text"]
        for r in streamed.select("url", "extracted_text").collect()
    }
    b_rows = {
        r["url"]: r["extracted_text"]
        for r in batch.select("url", "extracted_text").collect()
    }
    assert s_rows == b_rows
    # manifest committed with lineage
    assert store.committed_run_ids()
    # resume: a second stream pass over the same directory commits nothing new
    q2 = stream_extraction(spark, pages_dir, store)
    q2.awaitTermination()
    assert store.read_results(spark).count() == len(b_rows)


def test_stream_windowed_counts_matches_batch(spark):
    from legal_document_ocr_spark.operators.relational import windowed_event_counts

    sdf = stream_windowed_counts(spark, "/root/testdata/sf0.001/events.parquet")
    run_stream_to_table(spark, sdf, "t_stream_counts")
    streamed = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_stream_counts").collect()
    }
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    assert streamed == batch


def test_stream_sessionize_closed_sessions_match_batch(spark):
    from legal_document_ocr_spark.operators.relational import sessionize_events
    from legal_document_ocr_spark.streaming.pipeline import stream_sessionize

    sdf = stream_sessionize(spark, "/root/testdata/sf0.001/events.parquet")
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_stream_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["first_event"],
            r["last_event"],
        )
        for r in spark.table("t_stream_sessions").collect()
    }
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch_rows = sessionize_events(events).collect()
    last_per_user = {}
    for r in batch_rows:
        last_per_user[r["user_id"]] = max(
            last_per_user.get(r["user_id"], 0), r["session_id"]
        )
    expected = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["first_event"],
            r["last_event"],
        )
        for r in batch_rows
        if r["session_id"] != last_per_user[r["user_id"]]
    }
    assert streamed == expected
    assert streamed  # non-trivial: some sessions actually closed
