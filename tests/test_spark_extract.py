"""End-to-end Spark slice: synthetic pages → extraction UDF → image join.

The first "real query" of SURVEY.md §7.1 step 5: a DataFrame of synthetic
product pages is extracted with one broadcast template plan, extracted
image URLs are joined back to the images table, and the north-rule
per-row invariants hold — caption equality for every row and decoded-pixel
PSNR ≥ 40 dB (lossy) / exact (lossless).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapely_spark.spark import codec, datagen
from scrapely_spark.spark.extract import extract_records, plan_from_templates

N = 240


@pytest.fixture(scope="module")
def extracted(spark):
    pages = datagen.pages_df(spark, N)
    plan = plan_from_templates([datagen.template_body()])
    out = extract_records(pages, plan).withColumnRenamed(
        "caption", "extracted_caption")
    images = datagen.images_df(spark, N).withColumnRenamed(
        "caption", "true_caption")
    joined = (
        out.withColumn(
            "image_id",
            F.regexp_extract("image_url", r"/img/(img-\d+)\.", 1))
        .join(F.broadcast(images), "image_id", "inner")
        .select("url", "title", "price", "image_id", "fmt", "bytes",
                "true_caption", "extracted_caption")
    )
    return joined.collect()


def test_every_page_extracts(extracted):
    assert len(extracted) == N


def test_caption_equality(extracted):
    for row in extracted:
        assert row.extracted_caption == row.true_caption, row.url


def test_title_and_price_extracted(extracted):
    for row in extracted:
        assert row.title.startswith("Product ")
        assert "." in row.price


def test_decoded_pixel_fidelity(extracted):
    """North-rule invariant: PSNR ≥ 40 dB (lossy) / exact (lossless)."""
    lossy = lossless = 0
    for row in extracted:
        i = int(row.image_id.split("-")[1])
        image_id, w, h, fmt = datagen.image_meta(i)
        truth = codec.pixels_for(image_id, w, h)
        decoded, dw, dh, dfmt = codec.decode_image(bytes(row.bytes))
        assert (dw, dh, dfmt) == (w, h, fmt)
        if fmt == "png":
            assert np.array_equal(decoded, truth)
            lossless += 1
        else:
            score = codec.psnr(decoded, truth)
            assert score >= 40.0, (row.image_id, score)
            lossy += 1
    assert lossy > 0 and lossless > 0


def test_non_utf8_pages_through_spark_stage(spark):
    """Latin-1 bodies flow through the Arrow stage with entities intact."""
    tpl = datagen.template_body()
    body = datagen.page_record(7, 50)["body"].replace(
        "item 7", "caf\xe9 n\xb07")
    pages = spark.createDataFrame(
        [("http://l1.example.com/item/7", body, "latin1")],
        "url string, body string, encoding string")
    plan = plan_from_templates([tpl])
    row = extract_records(pages, plan).collect()[0]
    assert row.caption.endswith("caf\xe9 n\xb07")


def test_extraction_stage_has_no_shuffle(spark):
    """The extract stage must stay embarrassingly parallel (scan → UDF)."""
    pages = datagen.pages_df(spark, 16)
    plan = plan_from_templates([datagen.template_body()])
    physical = (extract_records(pages, plan)
                ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in physical, physical


def test_null_body_rows_skipped_not_crashed(spark):
    """A failed fetch leaves NULL body/url/encoding rows in the pages
    frame: the kernel must skip them, not TypeError the whole job."""
    pages = datagen.pages_df(spark, 8).select("url", "body") \
        .withColumn("encoding", F.lit("utf-8"))
    nulls = spark.createDataFrame(
        [(None, None, None), ("http://x/null-body", None, None)],
        "url string, body string, encoding string")
    plan = plan_from_templates([datagen.template_body()])
    n_clean = extract_records(pages, plan).count()
    n_mixed = extract_records(pages.unionByName(nulls), plan).count()
    assert n_clean == 8 and n_mixed == 8


def test_plan_broadcast_is_cached_per_session(spark):
    from scrapely_spark.spark.extract import _broadcast_plan

    plan = plan_from_templates([datagen.template_body()])
    b1 = _broadcast_plan(spark, plan)
    b2 = _broadcast_plan(spark, plan)
    assert b1 is b2  # one broadcast per (session, plan), not per call
