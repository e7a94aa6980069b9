"""Per-family registry segments (round-4 split of queries.py).

Each module holds the query callables and DuckDB oracle SQL for one
slice of the registry, byte-identical to their pre-split bodies; the
SPARK/ORACLE dicts that __spark_entry__ consumes stay in
legal_document_ocr_spark.queries (the thin aggregator).
"""
