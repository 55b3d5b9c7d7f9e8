"""Lexer parity: scrapely_spark.html.lexer vs the reference parse_html.

Runs both lexers over (a) the reference's real-page sample corpus
(tests/samples/samples_htmlpage_*.html), (b) the inline PAGE fixtures of
tests/test_htmlpage_data.py, and (c) assorted nasty markup, asserting the
fragment streams are identical (spans, kinds, names, attributes).
"""

from __future__ import annotations

import glob
import os

import pytest

from scrapely_spark.html.lexer import Tag, lex

from conftest import REFERENCE, load_reference_module

ref_htmlpage = pytest.importorskip("scrapely.htmlpage")


def _assert_same_stream(body: str):
    ours = list(lex(body))
    theirs = list(ref_htmlpage.parse_html(body))
    assert len(ours) == len(theirs), (
        "fragment count mismatch: %d vs %d" % (len(ours), len(theirs)))
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert a.start == b.start and a.end == b.end, (i, a, b)
        a_is_tag = isinstance(a, Tag)
        b_is_tag = isinstance(b, ref_htmlpage.HtmlTag)
        assert a_is_tag == b_is_tag, (i, a, b)
        if a_is_tag:
            assert a.name == b.tag, (i, a, b)
            assert a.kind == b.tag_type, (i, a, b)
            assert dict(a.attributes) == dict(b.attributes), (i, a, b)
        else:
            assert a.is_text == b.is_text_content, (i, a, b)


def test_sample_pages_parity():
    samples = sorted(glob.glob(
        os.path.join(REFERENCE, "tests/samples/samples_htmlpage_*.html")))
    assert samples, "reference sample corpus missing"
    for path in samples:
        with open(path, "rb") as fh:
            _assert_same_stream(fh.read().decode("utf-8"))


def test_inline_fixture_pages_parity():
    data = load_reference_module("tests/test_htmlpage_data.py",
                                 "ref_test_htmlpage_data")
    pages = [v for k, v in vars(data).items()
             if k.startswith("PAGE") and isinstance(v, str)]
    assert pages
    for body in pages:
        _assert_same_stream(body)


NASTY = [
    "",
    "plain text only",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<p>unclosed",
    "<p><b>bad</p></b>",
    "text <!-- comment --> more <!- broken",
    "<script>var x = '<p>not a tag</p>'; <!-- c --> y();</script>after",
    "<script src='x.js'/>selfclosed script?",
    "<img src=foo.jpg alt='a b' width=1 height=2>",
    "<a href=\"x\" href=\"y\">dup attr</a>",
    "<A HREF='UPPER'>case</A>",
    "<ns:tag attr='1'/>",
    "<input type=checkbox checked>",
    "<?xml version='1.0'?><p>pi</p>",
    "<!>empty comment<!>",
    "<div a=1 b = \"2\" c| = '3'>weird attrs</div>",
    "<p/>unpaired<br/>",
    "trailing < lone bracket",
    "<em>entity &amp; raw</em>",
    "<td colspan=2 rowspan=\"3\">cell</td>",
]


def test_nasty_markup_parity():
    for body in NASTY:
        _assert_same_stream(body)


def test_extraction_corpus_pages_parity(ref_extraction_corpus):
    mod = ref_extraction_corpus
    for name, templates, page, _desc, _expected in mod.TEST_DATA:
        for body in list(templates) + [page]:
            _assert_same_stream(body)
