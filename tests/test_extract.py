"""Byte-identical extraction invariant (BASELINE.json:input_hint)."""

from pyspark.sql import functions as F

from entity_linking_spark.fixtures import fixture_dataframes, generate_fixture
from entity_linking_spark.functions.extract import extract_text, extract_title


def test_extract_byte_identical_on_fixture(spark):
    fx = generate_fixture(num_pages=80, num_entities=25, seed=7)
    pages, _, _, _ = fixture_dataframes(spark, fx)
    bad = pages.where(extract_text("html") != F.col("text")).count()
    assert bad == 0


def test_extract_drops_script_style_decodes_entities(spark):
    html = (
        "<html><head><title>Ti</title><script>var x = '<p>sneaky</p>';</script>"
        "<style>body { color: red }</style></head>"
        "<body><p>A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;</p></body></html>"
    )
    df = spark.createDataFrame([(bytearray(html, "utf-8"),)], "html binary")
    got = df.select(extract_text("html").alias("t")).collect()[0]["t"]
    assert got == "Ti A & B <ok> \"q\" 's'"


def test_extract_deterministic_across_runs(spark):
    fx = generate_fixture(num_pages=20, num_entities=10, seed=11)
    pages, _, _, _ = fixture_dataframes(spark, fx)
    t1 = sorted(r["t"] for r in pages.select(extract_text("html").alias("t")).collect())
    t2 = sorted(
        r["t"]
        for r in pages.repartition(13).select(extract_text("html").alias("t")).collect()
    )
    assert t1 == t2


def test_extract_title(spark):
    df = spark.createDataFrame(
        [(bytearray(b"<html><head><title> My Page </title></head></html>"),)],
        "html binary",
    )
    assert df.select(extract_title("html").alias("t")).collect()[0]["t"] == "My Page"
