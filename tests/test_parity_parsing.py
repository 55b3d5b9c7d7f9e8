"""Template-compilation parity: compile_template vs reference parse_template.

Compares, for every template in the golden extraction corpus and the
real-page pageparsing sample: the token stream length, annotation slots
(spans, fields, tag-attribute maps, variants, affix text), ignored regions
and extra-required fields.  Token *ids* differ by design (ours are
vocabulary-local; insertion order ids don't survive parallelism) so we
compare token equality structure, not raw ids.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from scrapely_spark.html.page import HtmlPage
from scrapely_spark.ibl.parsing import compile_template, tokenize_page
from scrapely_spark.ibl.tokens import Vocab

from conftest import REFERENCE

ref_scrapely = pytest.importorskip("scrapely")

from scrapely.extraction.pageparsing import parse_template  # noqa: E402
from scrapely.extraction.pageobjects import TokenDict  # noqa: E402
from scrapely.htmlpage import HtmlPage as RefHtmlPage  # noqa: E402


def _ref_slot_view(ann):
    return {
        "start": ann.start_index,
        "end": ann.end_index,
        "field": ann.surrounds_attribute,
        "attrs": list(ann.tag_attributes),
        "variant": ann.variant_id,
        "affix": (None if ann.annotation_text is None else
                  (ann.annotation_text.start_text,
                   ann.annotation_text.follow_text)),
    }


def _our_slot_view(slot):
    return {
        "start": slot.start,
        "end": slot.end,
        "field": slot.field,
        "attrs": list(slot.attrs),
        "variant": slot.variant,
        "affix": (None if slot.affix is None else
                  (slot.affix.prefix, slot.affix.follow)),
    }


def _assert_template_parity(body: str):
    ours = compile_template(HtmlPage(None, {}, body), Vocab())
    theirs = parse_template(TokenDict(), RefHtmlPage(None, {}, body))

    assert [_our_slot_view(s) for s in ours.slots] == \
        [_ref_slot_view(a) for a in theirs.annotations]
    assert [(r.start, r.end) for r in ours.ignored] == \
        [(r.start_index, r.end_index) for r in theirs.ignored_regions]
    assert ours.required == set(theirs.extra_required_attrs)
    assert len(ours.tokens) == len(theirs.page_tokens)
    # same equality structure: tokens equal in ours iff equal in theirs
    a = np.asarray(ours.tokens)
    b = np.asarray(theirs.page_tokens)
    ai = {t: i for i, t in enumerate(dict.fromkeys(a.tolist()))}
    bi = {t: i for i, t in enumerate(dict.fromkeys(b.tolist()))}
    assert [ai[t] for t in a.tolist()] == [bi[t] for t in b.tolist()]


def test_corpus_templates(ref_extraction_corpus):
    for name, templates, _page, _d, _e in ref_extraction_corpus.TEST_DATA:
        for body in templates:
            _assert_template_parity(body)


def test_pageparsing_sample():
    samples = sorted(glob.glob(os.path.join(
        REFERENCE, "tests/samples/samples_pageparsing_*.html")))
    assert samples
    for path in samples:
        with open(path, "rb") as fh:
            _assert_template_parity(fh.read().decode("utf-8"))


def test_tokenize_page_maps_tokens_to_tags(ref_extraction_corpus):
    _n, _t, page, _d, _e = ref_extraction_corpus.TEST_DATA[0]
    hp = HtmlPage(None, {}, page)
    tokenized = tokenize_page(hp, Vocab())
    assert len(tokenized.tokens) == len(tokenized.tok2frag)
    from scrapely_spark.html.lexer import Tag
    for tok_i, frag_i in enumerate(tokenized.tok2frag):
        assert isinstance(hp.parsed_body[frag_i], Tag)
