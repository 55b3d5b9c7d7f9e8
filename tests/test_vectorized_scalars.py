"""Differential tests: vectorized series kernels == per-value scalars.

The scalar functions in functions.scalars are the semantic source of
truth (doctest-pinned against the reference's extractors.py).  The
series kernels must agree element-for-element on anything a column can
carry — fixed doctest corpus, adversarial separators, random fuzz.
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from scrapely_spark.functions import scalars
from scrapely_spark.functions.vectorized import (
    extract_image_url_series, extract_number_series, extract_price_series)

FIXED = [
    "asdf 234,234.45sdf ",
    "234,23",
    "234,230",
    "1,000,000.00",
    "1000,00",
    "500.000,00",
    "500 000,00",
    "&#163;129&#46;99",
    "adsfg",
    "",
    "  -45.3",
    "  +45.3",
    "  45.3, 7",
    ",100",
    ".100",
    "-1.",
    "1,",
    "1.",
    "0,0,0.1",
    "12.34.56",
    "12,34,5",
    "&#163;129&#46;99 and &#8364;5",
    "&#65 space-terminated",
    "price: USD 1 234,56",
    "٣٤",                      # Arabic-Indic digits: Python \d hit, RE2 miss
    "price ٣٤,٥",              # mixed Unicode-digit price
    "١ and 2",                 # Unicode digit changes the match count
    "&#1635;4",                # entity decodes TO a Unicode digit
    "१२३.४५",                  # Devanagari digits
    None,
]


def _compare(series_fn, scalar_fn, values):
    got = series_fn(pd.Series(values, dtype=object))
    want = [None if v is None else scalar_fn(v) for v in values]
    assert list(got) == want, (list(got), want)


def test_price_fixed_corpus():
    _compare(extract_price_series, scalars.extract_price, FIXED)


def test_number_fixed_corpus():
    _compare(extract_number_series, scalars.extract_number, FIXED)


# strings biased toward digits/separators/entities — the structure the
# branchy normalization logic actually discriminates on
_alphabet = st.sampled_from(list("0123456789.,- ;&#ab$£\n٣٤١٥१२"))
_txt = st.text(alphabet=_alphabet, max_size=24)


@settings(max_examples=400, deadline=None)
@given(st.lists(_txt, min_size=1, max_size=16))
def test_price_differential_fuzz(values):
    _compare(extract_price_series, scalars.extract_price, values)


@settings(max_examples=400, deadline=None)
@given(st.lists(_txt, min_size=1, max_size=16))
def test_number_differential_fuzz(values):
    _compare(extract_number_series, scalars.extract_number, values)


@pytest.mark.parametrize("n", [0, 1])
def test_degenerate_batches(n):
    vals = ["1,23"] * n
    assert list(extract_price_series(pd.Series(vals, dtype=object))) \
        == [scalars.extract_price(v) for v in vals]


IMG_FIXED = [
    # the scalar's doctest corpus
    "", "foo-bar.jpg", "/images/main_logo12.gif",
    "http://www.image.com/image.jpg",
    "background-image : url('http://www.site.com/path1/path2/image.jpg')",
    "/getimage.php?image=totalgardens/outbbq2_400.jpg&type=prod&resizeto=350",
    "../image.aspx?thumb=true&amp;boxSize=175&amp;img=Unknoportrait[1].jpg",
    "http://www.site.com/image.php",
    # adversarial: fallback-path triggers and urlparse corner shapes
    "HTTP://Host/IMG.JPG",          # uppercase scheme → lowercased
    "1:2.jpg",                      # invalid scheme → ':' kept in path
    "http:///x.jpg",                # '//' with empty netloc
    "//host/x.jpg",                 # scheme-relative
    "a;b/x.jpg?q=1",                # ';' → urlparse path params
    "x.jpg#frag", "x.jpg?#", "mailto:",
    " \t\"quoted.png\" ",           # url() trim
    "http://h/a//b.jpg", "//x.jpg?y=1",
    "naïve/ümage.jpg?x=1",          # non-ASCII
    "a\nb.jpg?x=1",                 # newline inside
    "http://\n/?1",                 # LF inside authority (bpo-43882
                                    # strip; hypothesis-found r3)
    "c:\\windows\\img.bmp",
    "background:url(a.png) no-repeat",
    "background-image:url()",       # empty css url
    None,
]


def test_image_url_fixed_corpus():
    _compare(extract_image_url_series, scalars.extract_image_url, IMG_FIXED)


# URL-shaped fragments biased toward the branchy structure: schemes,
# slashes, extensions, css wrappers, separators, quotes, whitespace
_img_alphabet = st.sampled_from(list("ab1./:?#;&=%~ _-'\"\t\n()\u00a0é"))
_img_frag = st.text(alphabet=_img_alphabet, max_size=16)
_img_url = st.one_of(
    _img_frag,
    _img_frag.map(lambda f: f + ".jpg"),
    _img_frag.map(lambda f: "http://" + f),
    _img_frag.map(lambda f: "background-image: url(%s)" % f),
    st.tuples(_img_frag, _img_frag).map(lambda t: "%s/%s.png?%s" % (t[0], t[1], t[0])))


@settings(max_examples=400, deadline=None)
@given(st.lists(_img_url, min_size=1, max_size=16))
def test_image_url_differential_fuzz(values):
    _compare(extract_image_url_series, scalars.extract_image_url, values)
