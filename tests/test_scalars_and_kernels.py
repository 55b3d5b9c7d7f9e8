"""Scalar-function + similarity-kernel parity and doctests.

Runs our doctests (mirroring the reference's), then drives both scalar
libraries over a shared input battery and asserts equal outputs.  The
similarity kernels are additionally property-tested against the
reference's pure-python implementations with hypothesis.
"""

from __future__ import annotations

import doctest

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import scrapely_spark.functions.scalars as ours
import scrapely_spark.ibl.matching as matching
from scrapely_spark.ibl.extractors import AffixExtractor, collect_fields
from scrapely_spark.ibl.parsing import Region

ref_scrapely = pytest.importorskip("scrapely")
import scrapely.extractors as theirs  # noqa: E402
import scrapely.extraction.similarity as ref_sim  # noqa: E402


def test_doctests_scalars():
    results = doctest.testmod(ours)
    assert results.failed == 0 and results.attempted > 10


def test_doctests_matching():
    results = doctest.testmod(matching)
    assert results.failed == 0 and results.attempted > 5


def test_affix_extractor_doctest():
    results = doctest.run_docstring_examples  # noqa: F841 (kept simple below)
    assert AffixExtractor("designed by ", ".").extract_text(
        "by Marc Newson.") == "Marc Newson"
    assert AffixExtractor("designed by").extract_text("y Marc Newson.") is None


TEXT_BATTERY = [
    "", "   ", "plain",
    "<h1>test</h1>", "<h1> test</h1> ",
    "test <!-- a comment --> me",
    "scripts are<script>n't</script> ignored",
    "only &pound;42 &euro;13 &#163;9 &#x41;",
    "<p>The text</p><?xml:namespace blabla/><p>is here</p>",
    "a &unknownentity; b &amp; c &amp d",
    "nested <div><em>markup</em> here</div>",
]

PRICE_BATTERY = [
    "asdf 234,234.45sdf ", "234,23", "234,230", "asdf 2234 sdf ", "947",
    "-200,069,000,006.565456", "1,000,000", "1,000,000.00", "1,000",
    "1000,00", "1,000.00", "500,000.00", "500.000,00", "-500,000.00",
    "500 000,00", "&#163;129&#46;99", "adsfg",
    "stained, linseed oil finish, clear glas doors", "", "1.999,99",
    "12.34.56,78", "7,77,77.5",
]

URL_BATTERY = [
    "", "   ", " \n\n  ", "foo-bar.jpg", "/images/main_logo12.gif",
    "http://www.image.com/image.jpg",
    "background-image : url('http://www.site.com/path1/path2/image.jpg')",
    "background : url(http://www.site.com/path1/path2/image.jpg)",
    "/getimage.php?image=totalgardens/outbbq2_400.jpg&type=prod&resizeto=350",
    "../image.aspx?thumb=true&amp;boxSize=175&amp;img=Unknoportrait[1].jpg",
    "http://www.sundancecatalog.com/mgen/catalog/test.ms?args=%2245932|"
    "MERIDIAN+PENDANT|.jpg%22&is=336,336,0xffffff",
    "http://www.site.com/image.php",
    "background-image:URL(http://s7d5.scene7.com/is/image/wasserstrom/"
    "165133?wid=227&hei=227&amp;defaultImage=noimage_wasserstrom)",
]


def test_text_parity():
    for s in TEXT_BATTERY:
        assert ours.text(ours.htmlregion(s)) == \
            theirs.text(theirs.htmlregion(s)), s


def test_notags_parity():
    for s in TEXT_BATTERY:
        assert ours.notags(ours.htmlregion(s)) == \
            theirs.notags(theirs.htmlregion(s)), s


def test_safehtml_parity():
    battery = TEXT_BATTERY + [
        "<strong>test <blink>test</blink></strong>",
        "<script>test </script>test",
        "<h2>header</h2> test <b>bold</b> <i>indent</i>",
        "<p>test <script>test</script></p>",
        "<!-- comment --> only &pound;42",
        "<p>test", "<p>test <i><br/><b>test</p>",
        "Keep <meta name=\"name\" content=\"data\"> and <b><hr> tags",
        "Keep content around <img src=\"image.jpg\"> <b>img</b> tag",
        "<td>cell</td></td> stray close",
        "<ul><li>a<li>b</ul>",
    ]
    for s in battery:
        assert ours.safehtml(ours.htmlregion(s)) == \
            theirs.safehtml(theirs.htmlregion(s)), s


def test_numbers_and_prices_parity():
    for s in PRICE_BATTERY:
        assert ours.extract_price(s) == theirs.extract_price(s), s
        assert ours.extract_number(s) == theirs.extract_number(s), s
        assert ours.contains_any_numbers(s) == \
            theirs.contains_any_numbers(s), s
        assert ours.contains_numbers(s, 2) == theirs.contains_numbers(s, 2), s


def test_image_url_parity():
    for s in URL_BATTERY:
        assert ours.image_url(s) == theirs.image_url(s), s
        assert ours.extract_image_url(s) == theirs.extract_image_url(s), s


# ---- similarity kernels: property-based parity --------------------------

token_lists = st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                       max_size=40)


@given(hay=token_lists, pat=token_lists)
@settings(max_examples=300, deadline=None)
def test_longest_unique_subsequence_parity(hay, pat):
    if not pat:
        return
    a = np.asarray(hay, dtype=np.int64)
    b = np.asarray(pat, dtype=np.int64)
    ours_result = matching.longest_unique_subsequence(a, b)
    theirs_result = ref_sim.longest_unique_subsequence(a, b)
    assert ours_result == tuple(theirs_result)


@given(hay=token_lists, pat=token_lists,
       lo=st.integers(0, 40), hi=st.integers(0, 40))
@settings(max_examples=300, deadline=None)
def test_ranged_match_parity(hay, pat, lo, hi):
    if not pat or lo >= hi or hi > len(hay):
        return
    a = np.asarray(hay, dtype=np.int64)
    b = np.asarray(pat, dtype=np.int64)
    assert matching.longest_unique_subsequence(a, b, lo, hi) == \
        tuple(ref_sim.longest_unique_subsequence(a, b, lo, hi))
    assert matching.first_longest_subsequence(list(a), list(b), lo, hi) == \
        tuple(ref_sim.first_longest_subsequence(list(a), list(b), lo, hi))


@given(hay=token_lists, pat=token_lists, start=st.integers(0, 39),
       end=st.integers(0, 40), zero_width=st.booleans())
@settings(max_examples=300, deadline=None)
def test_similar_region_parity(hay, pat, start, end, zero_width):
    if not hay or not pat:
        return
    tpl = np.asarray(pat, dtype=np.int64)
    page = np.asarray(hay, dtype=np.int64)
    s = min(start, len(tpl) - 1)
    e = s if zero_width else min(max(end, s), len(tpl) - 1)
    ours_result = matching.similar_region(page, tpl, Region(s, e))

    class _RefRegion:
        start_index = s
        end_index = e

    try:
        theirs_result = tuple(ref_sim.similar_region(page, tpl, _RefRegion()))
    except TypeError:
        # py2-era `None < int` comparison in the reference's zero-width
        # branch; our kernel implements the intended -inf semantics.
        return
    assert ours_result == theirs_result


def test_collect_fields():
    assert collect_fields(
        [("b", 2), ("a", 1), ("b", 3)]) == {"a": [1], "b": [2, 3]}
