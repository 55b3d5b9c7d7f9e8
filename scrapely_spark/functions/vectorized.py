"""Vectorized batch twins of the scalar refinement functions.

The per-value reference semantics live in ``functions.scalars`` (bit-exact
with scrapely's ``extractors.py`` doctests — see the citations there).
These twins process a whole Arrow batch with Arrow compute kernels
(RE2 + SIMD string passes in C++) instead of one Python call per value —
the shape a pandas UDF wants, and measured faster than the per-value map
at 60k-row batches.

The only per-value remnants are numeric-entity decoding (``&#NNN;`` →
``chr(NNN)`` needs a computed replacement RE2 cannot express), which runs
only on rows that literally contain ``&#``, and rows containing non-ASCII
Unicode digits (RE2's ``\d`` is ASCII-only while the scalar twins'
Python ``\d`` matches any Nd codepoint — e.g. ``'٣٤'``), which are
routed whole to the scalar source of truth.  Real columns rarely hit
either pre-filter.

Equality with the scalar twins is enforced differentially
(tests/test_vectorized_scalars.py: fixed doctest corpus + hypothesis
random strings), so the scalar function stays the single source of truth
for semantics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scrapely_spark.functions.scalars import (
    _IMAGE_EXTS, _decode_numeric_entities, extract_image_url,
    extract_number, extract_price)

# a digit by Python-re's Unicode \d that is NOT ASCII 0-9 — rows
# containing one diverge between RE2 (ASCII \d) and the scalar twins,
# so they fall back to the scalar path
_NON_ASCII_DIGIT_RE = re.compile(r"(?![0-9])\d")

# RE2 spellings of scalars._DECIMAL_RE / _NUMBER_RE (same languages;
# the differential fuzz in tests/test_vectorized_scalars.py pins them
# to the Python-re originals)
_DECIMAL_RE2 = r"(?P<v>-?\d[\d,.]*)"
_NUMBER_RE2 = r"(?P<v>-?\d+(?:\.\d+)?)"


def _decode_entities(s: pd.Series) -> pd.Series:
    """Series twin of ``_decode_numeric_entities`` (&#NNN; → chr(NNN))."""
    has_ent = s.str.contains("&#", regex=False).eq(True)  # NaN → False
    if not has_ent.any():
        return s
    out = s.copy()
    out[has_ent] = s[has_ent].map(_decode_numeric_entities)
    return out


def _empty(s: pd.Series) -> pd.Series:
    return pd.Series([], index=s.index, dtype=object)


def _apply_scalar_fallback(out: pd.Series, original: pd.Series,
                           decoded: pd.Series, scalar_fn) -> pd.Series:
    """Overwrite rows whose decoded text contains a non-ASCII Unicode
    digit with the scalar twin's answer (checked post-entity-decode so
    ``&#NNN;``-produced digits are caught too)."""
    mask = decoded.str.contains(_NON_ASCII_DIGIT_RE).eq(True)  # NaN→False
    if mask.any():
        out = out.copy()
        out[mask] = original[mask].map(scalar_fn)
    return out


def _last_index_of(arr, sub: str, n):
    """Vectorized str.rfind: -1 when absent, else last occurrence index."""
    rev_pos = pc.find_substring(pc.utf8_reverse(arr), sub)
    return pc.if_else(pc.greater_equal(rev_pos, 0),
                      pc.subtract(pc.subtract(n, 1), rev_pos),
                      pa.scalar(-1, pa.int32()))


def extract_price_series(s: pd.Series) -> pd.Series:
    """Vectorized ``extract_price``: last-separator-wins normalization."""
    if len(s) == 0:
        return _empty(s)
    decoded = _decode_entities(s)
    arr = pa.Array.from_pandas(decoded)
    clean = pc.replace_substring(arr, " ", "")
    v = pc.struct_field(pc.extract_regex(clean, _DECIMAL_RE2), "v")

    n = pc.utf8_length(v)
    last_dot = _last_index_of(v, ".", n)
    last_comma = _last_index_of(v, ",", n)
    first_comma = pc.find_substring(v, ",")

    # mirrors the scalar branch structure exactly: when both separators
    # appear (at index > 0), the later one is the decimal point; a lone
    # comma is decimal iff it is the only comma with <= 2 digits after it
    both = pc.and_(pc.greater(last_dot, 0), pc.greater(last_comma, 0))
    lone_comma_decimal = pc.and_(
        pc.and_(pc.greater(last_comma, 0),
                pc.equal(first_comma, last_comma)),
        pc.less_equal(pc.subtract(n, last_comma), 3))
    comma_is_decimal = pc.if_else(
        both, pc.greater(last_comma, last_dot), lone_comma_decimal)

    comma_as_decimal = pc.replace_substring(
        pc.replace_substring(v, ".", ""), ",", ".")
    comma_as_grouping = pc.replace_substring(v, ",", "")
    out = pc.if_else(comma_is_decimal, comma_as_decimal, comma_as_grouping)
    res = out.to_pandas().astype(object).where(lambda x: x.notna(), None)
    res.index = s.index
    return _apply_scalar_fallback(res, s, decoded, extract_price)


def extract_number_series(s: pd.Series) -> pd.Series:
    """Vectorized ``extract_number``: the single number in the text."""
    if len(s) == 0:
        return _empty(s)
    decoded = _decode_entities(s)
    arr = pa.Array.from_pandas(decoded)
    counts = pc.count_substring_regex(arr, _NUMBER_RE2)
    first = pc.struct_field(pc.extract_regex(arr, _NUMBER_RE2), "v")
    out = pc.if_else(pc.equal(counts, 1), first, pa.scalar(None, pa.string()))
    res = out.to_pandas().astype(object).where(lambda x: x.notna(), None)
    res.index = s.index
    return _apply_scalar_fallback(res, s, decoded, extract_number)


# --- image_url ------------------------------------------------------------
#
# RE2 spellings of the scalar pipeline's pieces (scalars.extract_image_url):
# trim → CSS url(...) extract → urlparse → image-extension path search →
# urlunparse rebuild.  The urlparse/urlunparse pair is replaced by one
# RFC-3986 decomposition regex plus a conditional rebuild; rows where the
# stdlib parser's extra rules would kick in (listed at _image_fallback_mask)
# route to the scalar source of truth.

_CSS_RE2 = r"(?i)background(?:-image)?\s*:\s*url\((?P<u>.*?)\)"
# RFC 3986 appendix-B shape with the netloc marker captured separately so
# "//"-present-but-empty netloc is detectable
_SPLIT_RE2 = (r"^(?:(?P<sch>[^:/?#]+):)?(?:(?P<sl>//)(?P<net>[^/?#]*))?"
              r"(?P<path>[^?#]*)(?:\?(?P<q>[^#]*))?(?:#(?P<frag>.*))?$")
_VALID_SCHEME_RE2 = r"^[A-Za-z][A-Za-z0-9+.\-]*$"
_IMG_PATH_RE2 = (r"(?i)(?P<m>/?(?:[^/]+/)*(?:.+\.(?:%s)))"
                 % "|".join(_IMAGE_EXTS))
_ANY_PATH_RE2 = r"(?i)(?P<m>/?(?:[^/]+/)*(?:.+))"


def _s(v) -> "pa.StringScalar":
    return pa.scalar(v, pa.string())


def _cat(*arrs):
    """Element-wise concat (inputs must be null-free)."""
    return pc.binary_join_element_wise(*arrs, _s(""))


def _mask(a) -> np.ndarray:
    return pc.fill_null(a, False).to_numpy(zero_copy_only=False)


def extract_image_url_series(s: pd.Series) -> pd.Series:
    """Vectorized ``extract_image_url``; hard rows → scalar fallback."""
    if len(s) == 0:
        return _empty(s)
    arr = pa.Array.from_pandas(s)
    t = pc.utf8_trim(arr, "\t\r\n '\"")
    css = pc.struct_field(pc.extract_regex(t, _CSS_RE2), "u")
    t2 = pc.if_else(pc.is_valid(css), css, t)
    parts = pc.extract_regex(t2, _SPLIT_RE2)
    sch = pc.struct_field(parts, "sch")
    sl = pc.struct_field(parts, "sl")
    net = pc.struct_field(parts, "net")
    path = pc.struct_field(parts, "path")
    q = pc.struct_field(parts, "q")
    frag = pc.struct_field(parts, "frag")

    img = pc.struct_field(pc.extract_regex(path, _IMG_PATH_RE2), "m")
    anyp = pc.struct_field(pc.extract_regex(path, _ANY_PATH_RE2), "m")
    has_q = pc.and_kleene(pc.is_valid(q), pc.not_equal(q, _s("")))
    newpath = pc.if_else(
        pc.is_valid(img), img,
        pc.if_else(pc.fill_null(has_q, False), anyp, _s(None)))

    sch_part = pc.if_else(
        pc.is_valid(sch), _cat(pc.fill_null(pc.utf8_lower(sch), ""),
                               _s(":")), _s(""))
    net_part = pc.if_else(
        pc.is_valid(sl), _cat(_s("//"), pc.fill_null(net, "")), _s(""))
    q_part = pc.if_else(pc.fill_null(has_q, False),
                        _cat(_s("?"), pc.fill_null(q, "")), _s(""))
    has_f = pc.and_kleene(pc.is_valid(frag), pc.not_equal(frag, _s("")))
    f_part = pc.if_else(pc.fill_null(has_f, False),
                        _cat(_s("#"), pc.fill_null(frag, "")), _s(""))
    rebuilt = _cat(sch_part, net_part, pc.fill_null(newpath, ""),
                   q_part, f_part)
    value = pc.if_else(pc.is_valid(newpath), rebuilt, t2)

    res = value.to_pandas().astype(object)
    res = res.where(res.notna(), None)
    res.index = s.index
    # url(): empty after trim → None
    res[_mask(pc.equal(pc.utf8_length(t), 0))] = None

    # rows the stdlib parser treats differently — recompute with the
    # scalar source of truth:
    def srch(a, pat):
        return _mask(pc.match_substring_regex(a, pat))
    fb = (
        # non-ASCII anywhere: Python \s / urlparse are unicode-aware
        srch(t, r"[^\x00-\x7F]")
        # interior tab/CR/LF: urlparse removes these bytes ANYWHERE in
        # the url (bpo-43882) — the RE2 decomposition would keep them
        | srch(t, r"[\t\r\n]")
        # decomposition regex didn't span the string (e.g. \n placement)
        | (_mask(pc.is_valid(t2)) & ~_mask(pc.is_valid(parts)))
        # ':' present but not a urlparse-valid scheme
        | (_mask(pc.is_valid(sch))
           & ~_mask(pc.match_substring_regex(sch, _VALID_SCHEME_RE2)))
        # '//' with empty netloc (urlunparse re-slashing rules)
        | (_mask(pc.is_valid(sl)) & _mask(pc.equal(net, _s(""))))
        # ';' → urlparse path-params splitting
        | srch(path, ";")
        # matched path starting '//' → urlunparse prepends another '//'
        | _mask(pc.starts_with(newpath, "//")))
    fb &= s.notna().to_numpy()
    if fb.any():
        res[fb] = s[fb].map(extract_image_url)
    return res


# pandas-UDF dispatch: scalar function name → series kernel
SERIES_KERNELS = {
    "extract_price": extract_price_series,
    "extract_number": extract_number_series,
    "extract_image_url": extract_image_url_series,
}
