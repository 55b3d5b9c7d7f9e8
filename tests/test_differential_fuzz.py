"""Differential fuzzing: random templates/pages through both engines.

Seeded generator builds random product-ish templates (annotations on
random tags, optional repeats, variants, ignored regions, attribute
annotations, entity noise, broken markup) and structurally-mutated pages;
every case runs through the reference extractor and ours, asserting
identical output.  Catches parity drift the 40-case golden corpus and
per-kernel property tests can miss (interaction bugs).
"""

from __future__ import annotations

import json
import random

import pytest

from scrapely_spark.html.page import HtmlPage
from scrapely_spark.ibl import InstanceBasedLearningExtractor

ref_scrapely = pytest.importorskip("scrapely")

from scrapely.htmlpage import HtmlPage as RefHtmlPage  # noqa: E402
from scrapely.extraction import (  # noqa: E402
    InstanceBasedLearningExtractor as RefIBLE)

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
_TAGS = ["div", "span", "p", "li", "em", "strong", "td", "h2"]
_FIELDS = ["name", "price", "blurb", "kind", "origin"]


def _ann(payload: dict) -> str:
    return ' data-scrapy-annotate="%s"' % json.dumps(payload).replace(
        '"', "&quot;")


def _text(rng, n=4):
    words = [rng.choice(_WORDS) for _ in range(rng.randint(1, n))]
    if rng.random() < 0.15:
        words.append("&amp;")
    if rng.random() < 0.1:
        words.append("%d.%02d" % (rng.randint(1, 999), rng.randint(0, 99)))
    return " ".join(words)


def _element(rng, annotate_field=None, variant=None):
    tag = rng.choice(_TAGS)
    attrs = ""
    payload = {}
    if annotate_field:
        payload["annotations"] = {"content": annotate_field}
        if rng.random() < 0.25:
            payload["annotations"]["title"] = annotate_field + "_attr"
            attrs += ' title="%s"' % _text(rng, 2)
        if variant:
            payload["variant"] = variant
        attrs += _ann(payload)
    if rng.random() < 0.2:
        attrs += ' class="%s"' % rng.choice(_WORDS)
    return "<%s%s>%s</%s>" % (tag, attrs, _text(rng), tag)


def make_template(rng) -> str:
    parts = ["<html><body>", "<h1>%s</h1>" % _text(rng)]
    fields = rng.sample(_FIELDS, rng.randint(1, 4))
    for f in fields:
        if rng.random() < 0.3:
            parts.append("<p>%s</p>" % _text(rng))
        parts.append(_element(rng, f))
    if rng.random() < 0.3:  # repeated group
        for _ in range(2):
            parts.append("<li%s>%s</li>" % (
                _ann({"annotations": {"content": "feature"}}), _text(rng)))
    if rng.random() < 0.25:  # adjacent variants
        for vid in (1, 2):
            parts.append('<tr><td%s>%s</td><td%s>%s</td></tr>' % (
                _ann({"annotations": {"content": "colour"}, "variant": vid}),
                _text(rng, 2),
                _ann({"annotations": {"content": "cost"}, "variant": vid}),
                _text(rng, 2)))
    if rng.random() < 0.2:  # ignored region
        parts.append('<div data-scrapy-ignore="true"><em>%s</em></div>'
                     % _text(rng))
    if rng.random() < 0.15:  # broken markup
        parts.append("<p>unclosed %s" % _text(rng))
    parts.append("</body></html>")
    return "\n".join(parts)


def mutate_to_page(rng, template: str) -> str:
    """Template → page: strip annotations, rewrite text, structural noise."""
    import re
    page = re.sub(r'\s*data-scrapy-annotate="[^"]*"', "", template)
    page = re.sub(r'\s*data-scrapy-ignore="[^"]*"', "", page)

    def new_text(m):
        return ">%s<" % _text(rng)

    page = re.sub(r">([^<>]+)<", new_text, page)
    if rng.random() < 0.4:  # insert unrelated elements
        page = page.replace("</body>",
                            "<div>%s</div></body>" % _text(rng))
    if rng.random() < 0.3:  # duplicate a list item
        page = page.replace("<li>", "<li>", 1)
    return page


def _run_case(seed: int):
    rng = random.Random(seed)
    template = make_template(rng)
    page = mutate_to_page(rng, template)

    ours = InstanceBasedLearningExtractor([(HtmlPage(None, {}, template),
                                            None)])
    ours_out, ours_tpl = ours.extract(HtmlPage(None, {}, page))

    theirs = RefIBLE([(RefHtmlPage(None, {}, template), None)])
    theirs_out, theirs_tpl = theirs.extract(RefHtmlPage(None, {}, page))

    assert ours_out == theirs_out, (
        "divergence at seed %d\ntemplate:\n%s\npage:\n%s\nours: %r\n"
        "theirs: %r" % (seed, template, page, ours_out, theirs_out))
    assert (ours_tpl is None) == (theirs_tpl is None)


@pytest.mark.parametrize("seed", range(500))
def test_differential(seed):
    _run_case(seed)


@pytest.mark.parametrize("seed", range(600, 700))
def test_differential_with_descriptors(seed):
    """Descriptors in the loop: scalar extractors + required rejection."""
    import scrapely.descriptor as refd
    import scrapely.extractors as refx

    from scrapely_spark.functions import (
        contains_any_numbers, extract_number, extract_price, notags)
    from scrapely_spark.ibl.schema import FieldDescriptor, ItemDescriptor

    rng = random.Random(seed)
    template = make_template(rng)
    page = mutate_to_page(rng, template)

    pick = rng.randint(0, 3)
    required = rng.random() < 0.4
    ours_fns = [notags, extract_price, extract_number, contains_any_numbers]
    ref_fns = [refx.notags, refx.extract_price, refx.extract_number,
               refx.contains_any_numbers]
    field = rng.choice(_FIELDS)

    our_desc = ItemDescriptor("t", "", [
        FieldDescriptor(field, "", ours_fns[pick], required)])
    ref_desc = refd.ItemDescriptor("t", "", [
        refd.FieldDescriptor(field, "", ref_fns[pick], required)])

    ours = InstanceBasedLearningExtractor(
        [(HtmlPage(None, {}, template), our_desc)])
    ours_out, _ = ours.extract(HtmlPage(None, {}, page))
    theirs = RefIBLE([(RefHtmlPage(None, {}, template), ref_desc)])
    theirs_out, _ = theirs.extract(RefHtmlPage(None, {}, page))

    assert ours_out == theirs_out, (seed, field, pick, required, template,
                                    page, ours_out, theirs_out)


@pytest.mark.parametrize("seed", range(500, 600))
def test_differential_multi_template(seed):
    """Two templates: precedence (annotation count) + first-win trial."""
    rng = random.Random(seed)
    t1, t2 = make_template(rng), make_template(rng)
    page = mutate_to_page(rng, t1 if rng.random() < 0.5 else t2)

    ours = InstanceBasedLearningExtractor(
        [(HtmlPage(None, {}, t), None) for t in (t1, t2)])
    ours_out, _ = ours.extract(HtmlPage(None, {}, page))

    theirs = RefIBLE([(RefHtmlPage(None, {}, t), None) for t in (t1, t2)])
    theirs_out, _ = theirs.extract(RefHtmlPage(None, {}, page))

    assert ours_out == theirs_out, (seed, t1, t2, page, ours_out,
                                    theirs_out)
