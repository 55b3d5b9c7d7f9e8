"""Extraction parity: scrapely_spark IBL engine vs the reference corpus.

Every case of the reference's golden end-to-end corpus
(tests/test_extraction.py TEST_DATA — repeats, variants, ignored regions,
generated annotations, required-attr rejection, script/comment traps) is
run through:

1. the reference InstanceBasedLearningExtractor (live oracle), and
2. our engine, with descriptors converted to our scalar functions,

asserting both equal the hardcoded expected output byte-for-byte.
"""

from __future__ import annotations

import pytest

import scrapely_spark.functions as our_fns
from scrapely_spark.html.page import HtmlPage
from scrapely_spark.ibl import InstanceBasedLearningExtractor
from scrapely_spark.ibl.schema import FieldDescriptor, ItemDescriptor

ref_scrapely = pytest.importorskip("scrapely")

_BY_NAME = {
    name: getattr(our_fns, name)
    for name in ("text", "notags", "safehtml", "html", "url", "image_url",
                 "contains_any_numbers", "contains_prices",
                 "contains_numbers", "extract_number", "extract_price")
}


def convert_descriptor(ref_descriptor):
    """Reference ItemDescriptor → ours, remapping named scalar extractors.

    Anonymous lambdas in the corpus are duck-typed (slicing /
    ``.text_content`` work on our region objects) and pass through.
    """
    if ref_descriptor is None:
        return None
    fields = []
    for d in ref_descriptor.attribute_map.values():
        extractor = _BY_NAME.get(getattr(d.extractor, "__name__", ""),
                                 d.extractor)
        fields.append(FieldDescriptor(d.name, d.description, extractor,
                                      d.required))
    return ItemDescriptor(ref_descriptor.name, ref_descriptor.description,
                          fields)


def _case_ids(mod):
    return [case[0] for case in mod.TEST_DATA]


def test_corpus_size(ref_extraction_corpus):
    assert len(ref_extraction_corpus.TEST_DATA) >= 40


def test_reference_oracle_agrees_with_goldens(ref_extraction_corpus):
    """Sanity: the live reference (through our w3lib shim) reproduces its
    own golden outputs — validating the shim implementations."""
    from scrapely.htmlpage import HtmlPage as RefHtmlPage
    from scrapely.extraction import (
        InstanceBasedLearningExtractor as RefIBLE)

    failures = []
    for name, templates, page, descriptor, expected in (
            ref_extraction_corpus.TEST_DATA):
        tpl_pages = [RefHtmlPage(None, {}, t) for t in templates]
        ex = RefIBLE([(t, descriptor) for t in tpl_pages])
        actual, _ = ex.extract(RefHtmlPage(None, {}, page))
        got = actual and actual[0]
        if got != expected:
            failures.append((name, expected, got))
    assert not failures, failures


def test_our_engine_matches_goldens(ref_extraction_corpus):
    failures = []
    for name, templates, page, descriptor, expected in (
            ref_extraction_corpus.TEST_DATA):
        tpl_pages = [HtmlPage(None, {}, t) for t in templates]
        ours = InstanceBasedLearningExtractor(
            [(t, convert_descriptor(descriptor)) for t in tpl_pages])
        actual, _ = ours.extract(HtmlPage(None, {}, page))
        got = actual and actual[0]
        if got != expected:
            failures.append((name, expected, got))
    assert not failures, "\n".join(repr(f) for f in failures)


def _both(templates, page):
    from scrapely.extraction import (
        InstanceBasedLearningExtractor as RefIBLE)
    from scrapely.htmlpage import HtmlPage as RefHtmlPage

    ref, _ = RefIBLE(
        [(RefHtmlPage(None, {}, t), None) for t in templates]
    ).extract(RefHtmlPage(None, {}, page))
    ours, _ = InstanceBasedLearningExtractor(
        [(HtmlPage(None, {}, t), None) for t in templates]
    ).extract(HtmlPage(None, {}, page))
    return ref, ours


def test_replacement_stack_pops_none_verbatim():
    """A nested same-name tag inside a data-scrapy-replacement scope
    pops a None stack entry; the reference files that annotation under
    key None — where no close tag ever completes it — so the
    annotation is DROPPED.  Resolving the None back to the real tag
    name completed it and emitted slots the reference never does
    (193/4000 fuzz templates diverged)."""
    tpl = ('<html><body>'
           '<div data-scrapy-annotate="{&quot;annotations&quot;:'
           ' {&quot;content&quot;: &quot;f1&quot;}}"'
           ' data-scrapy-replacement="p">outer'
           '<div data-scrapy-annotate="{&quot;annotations&quot;:'
           ' {&quot;content&quot;: &quot;f2&quot;}}">inner'
           '<li>alpha</li><li>beta</li>'
           '</div></div></body></html>')
    page = ('<html><body><p>outer<div>inner'
            '<li>alpha</li><li>beta</li>'
            '</div></p></body></html>')
    ref, ours = _both([tpl], page)
    assert ours == ref


def test_region_ending_at_fragment_zero_keeps_reference_quirk():
    """A region that ENDS at fragment index 0 slices through the LAST
    fragment's end (the reference's falsy-zero `end_index or -1`), not
    an empty string (75/3000 fuzz pairs diverged under `is not
    None`)."""
    tpl = ('<a data-scrapy-annotate="{&quot;annotations&quot;:'
           ' {&quot;content&quot;: &quot;f&quot;}}">x</a>')
    page = '<a></a>trailing text'
    ref, ours = _both([tpl], page)
    assert ours == ref


def test_lone_surrogates_never_crash_char_matching():
    """surrogateescape-decoded fetch bytes put lone surrogates in page
    text; char-level (generated-annotation) matching must extract,
    not raise UnicodeEncodeError and kill the Arrow task."""
    from scrapely_spark.ibl.extractors import AffixExtractor
    from scrapely_spark.ibl.matching import as_array

    s = "designed by Marc\ud800Newson."
    assert len(as_array(s)) == len(s)
    got = AffixExtractor("designed by ", ".").extract_text(s)
    assert got == "Marc\ud800Newson"
