"""SQL function surface (functions/) + plan inspection helpers (plans/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legal_document_ocr_spark.functions import register_all
from legal_document_ocr_spark.kernels import clean_text, extract_page
from legal_document_ocr_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
)
from legal_document_ocr_spark.sources.pages import fixture_pages_df


def test_sql_surface_matches_kernels(spark):
    register_all(spark)
    fixture_pages_df(spark).limit(30).createOrReplaceTempView("pages_fn_v")
    rows = spark.sql(
        """
        SELECT url, html,
               ldos_extract_text(html) AS txt,
               ldos_extract_page(html).n_kept AS n_kept,
               ldos_clean_text('a\\nb ') AS cleaned
        FROM pages_fn_v
        """
    ).collect()
    assert rows
    for r in rows:
        expected = extract_page(r["html"])
        assert r["txt"] == expected["extracted_text"]
        assert r["n_kept"] == expected["n_kept"]
        assert r["cleaned"] == clean_text("a\nb ")


def test_sql_fields_surface(spark):
    register_all(spark)
    df = spark.createDataFrame(
        [("Số: 12/AB-CD",)], "t string"
    )
    df.createOrReplaceTempView("fields_fn_v")
    row = spark.sql(
        "SELECT ldos_extract_fields(t).document_number AS num FROM fields_fn_v"
    ).collect()[0]
    assert row["num"] == "12"


def test_plan_helpers(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    filtered = docs.where(F.col("doc_id") == 7)
    assert any("doc_id" in f for f in pushed_filters(filtered))
    joined = docs.join(F.broadcast(nation), docs.doc_id == nation.n_nationkey)
    assert has_broadcast_join(joined)
    agg = docs.groupBy("lang").count()
    assert count_exchanges(agg) >= 1


def test_xml_escape_roundtrip_adversarial(spark):
    """The xml_field_extract escape chain must survive strings that contain
    pre-escaped entities, bare markup, and boundary whitespace — cases the
    synthetic corpus never produces."""
    nasty = [
        "a & b < c > d",
        "&amp; already escaped",
        "<t>fake element</t>",
        "  leading and trailing  ",
        'quotes " and \' pass through',
        "&&&<<<>>>",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "orig string")
    esc = F.col("orig")
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    xml = F.concat(F.lit("<r><t>"), esc, F.lit("</t></r>"))
    back = df.select(
        "orig",
        F.from_xml(
            xml, "t STRING", {"ignoreSurroundingSpaces": "false"}
        ).getField("t").alias("rt"),
    )
    assert all(r.orig == r.rt for r in back.collect())


def test_variant_typed_access_null_safety(spark):
    """try_variant_get returns NULL (not a task failure) for absent paths
    and for type-incompatible casts; variant_get succeeds on the typed
    path. schema_of_variant reflects the shredded shape."""
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"k": 9, "s": "y"}',)], "props string"
    )
    out = df.selectExpr(
        "variant_get(parse_json(props), '$.k', 'long') AS k",
        "try_variant_get(parse_json(props), '$.missing', 'long') AS m",
        "try_variant_get(parse_json(props), '$.s', 'long') AS bad_cast",
        "schema_of_variant(parse_json(props)) AS sch",
    ).collect()
    assert [r.k for r in out] == [7, 9]
    assert all(r.m is None for r in out)
    assert all(r.bad_cast is None for r in out)
    assert all(r.sch == "OBJECT<k: BIGINT, s: STRING>" for r in out)


def test_try_element_at_index_zero_still_raises(spark):
    """try_element_at protects out-of-bounds, NOT invalid index 0 — that
    edge raises by spec (pinned so ansi_safety's 1-based index expression
    stays load-bearing)."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO"):
        spark.sql("SELECT try_element_at(array('a'), 0)").collect()
    ok = spark.sql("SELECT try_element_at(array('a'), 5) AS v").collect()
    assert ok[0].v is None
