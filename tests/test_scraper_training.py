"""Scraper train→scrape roundtrip + TemplateMaker parity.

Mirrors the reference's tests/test_scraper.py and tests/test_template.py:
train on the latin1 loadstore sample, scrape the second page, check the
extracted keys, re-check after JSON (de)serialization — and compare the
full extracted values against the live reference scraper.
"""

from __future__ import annotations

import io
import json
import os

import pytest

from scrapely_spark.html.page import HtmlPage
from scrapely_spark.scraper import (
    FragmentAlreadyAnnotated,
    FragmentNotFound,
    Scraper,
    TemplateMaker,
    best_match,
)

from conftest import REFERENCE

ref_scrapely = pytest.importorskip("scrapely")


def _load_sample(i: int, encoding: str = "latin1"):
    base = os.path.join(REFERENCE, "tests/samples/samples_scraper_loadstore_")
    with open(base + "%d.html" % i, "rb") as fh:
        body = fh.read().decode(encoding)
    with open(base + "%d.json" % i) as fh:
        data = json.load(fh)
    return body, data


def test_train_scrape_roundtrip():
    enc = "latin1"
    html1, data1 = _load_sample(0, enc)
    html2, data2 = _load_sample(1, enc)

    sc = Scraper()
    sc.train_from_htmlpage(HtmlPage(body=html1, encoding=enc), data1)
    page2 = HtmlPage(body=html2, encoding=enc)
    extracted = sc.scrape_page(page2)
    assert sorted(extracted[0].keys()) == sorted(data2.keys())

    # serialize / deserialize and re-check
    fh = io.StringIO()
    sc.tofile(fh)
    fh.seek(0)
    extracted2 = Scraper.fromfile(fh).scrape_page(page2)
    assert sorted(extracted2[0].keys()) == sorted(data2.keys())

    # full-value parity vs the live reference
    ref_sc = ref_scrapely.Scraper()
    ref_sc.train_from_htmlpage(
        ref_scrapely.HtmlPage(body=html1, encoding=enc), data1)
    ref_extracted = ref_sc.scrape_page(
        ref_scrapely.HtmlPage(body=html2, encoding=enc))
    assert extracted == ref_extracted


PAGE = ('<html><body><h1>Some title</h1>'
        '<p>A paragraph with text</p>'
        '<p>And another paragraph</p></body></html>')


def test_templatemaker_annotate_and_parse():
    tm = TemplateMaker(HtmlPage(body=PAGE))
    tm.annotate("field1", best_match("text"))
    annotations = tm.annotations()
    assert [a[0] for a in annotations] == [
        {"annotations": {"content": "field1"}}]

    ref_tm = ref_scrapely.TemplateMaker(ref_scrapely.HtmlPage(body=PAGE))
    ref_tm.annotate("field1", ref_scrapely.best_match("text"))
    assert tm.get_template().body == ref_tm.get_template().body


def test_templatemaker_not_found_and_double_annotation():
    tm = TemplateMaker(HtmlPage(body=PAGE))
    with pytest.raises(FragmentNotFound):
        tm.annotate("f", best_match("absent text"))
    tm.annotate("f", best_match("paragraph with"))
    with pytest.raises(FragmentAlreadyAnnotated):
        tm.annotate("g", best_match("paragraph with"))


def test_templatemaker_trained_template_extracts():
    tm = TemplateMaker(HtmlPage(body=PAGE))
    tm.annotate("title", best_match("Some title"))
    sc = Scraper([tm.get_template()])
    out = sc.scrape_page(HtmlPage(
        body=PAGE.replace("Some title", "Another title")))
    assert out == [{"title": ["Another title"]}]


def test_trace_mode_attaches_execution_trace():
    """IBL extractor trace=True (reference extraction/__init__.py:39,55-57
    + TraceExtractor): records gain a 'trace' list of execution events;
    default stays trace-free byte-identical."""
    from scrapely_spark.ibl import InstanceBasedLearningExtractor

    tm = TemplateMaker(HtmlPage(body=PAGE))
    tm.annotate("title", best_match("Some title"))
    template = tm.get_template()
    page = HtmlPage(body=PAGE.replace("Some title", "Another title"))

    plain = InstanceBasedLearningExtractor([(template, None)])
    records, _ = plain.extract(page)
    assert records == [{"title": ["Another title"]}]  # no trace key

    traced = InstanceBasedLearningExtractor([(template, None)], trace=True)
    records, _ = traced.extract(page)
    [record] = records
    assert record["title"] == ["Another title"]
    assert isinstance(record["trace"], list) and record["trace"]
    joined = "\n".join(record["trace"])
    assert "SlotExtractor" in joined
    assert "Another title" in joined  # page snippet + extracted pairs
