"""Vectorized sequence-similarity kernels for IBL region matching.

Parity targets: ``scrapely/extraction/similarity.py`` (and the optional
cython ``_similarity.pyx``).  Semantics are bit-identical — in particular
the *uniqueness* rule of ``longest_unique_subsequence`` (a tied longest
match means NO match, §3.2 of Zhai & Liu, "Extracting Web Data Using
Instance-Based Learning") and the zero-width-region branch of
``similar_region`` — but the implementation is numpy-vectorized instead of
a per-position Python loop: candidate positions are pre-filtered with
``flatnonzero`` on the first needle token, and common-prefix lengths are
computed for *all* candidates at once with geometrically-growing window
compares (bounded memory even for pathological needle lengths).

These kernels are the inner loop of the Arrow-batched extraction UDF; they
operate on int64 token arrays (tags) or uint32 codepoint arrays (char-level
matching for generated annotations).
"""

from __future__ import annotations

import numpy as np

_EMPTY_I64 = np.empty(0, dtype=np.int64)


def as_array(seq) -> np.ndarray:
    """Coerce a token list / string to a numpy array suitable for matching.

    Strings become uint32 codepoint arrays (the char-level path used by
    generated-annotation prefix/suffix matching).
    """
    if isinstance(seq, np.ndarray):
        return seq
    if isinstance(seq, str):
        if not seq:
            return np.empty(0, dtype=np.uint32)
        # surrogatepass: a lone surrogate (surrogateescape-decoded
        # fetch bytes, JSON round-trips) must encode to its codepoint,
        # not raise UnicodeEncodeError — the reference's pure-string
        # matching handles such pages, and a raise here would kill the
        # whole Arrow extraction task
        return np.frombuffer(
            seq.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    return np.asarray(seq, dtype=np.int64)


def common_prefix_length(a, b) -> int:
    """Length of the common prefix of two sequences.

    >>> common_prefix_length([1, 3, 4], [1, 3, 5, 1])
    2
    >>> common_prefix_length([1], [])
    0
    """
    a = as_array(a)
    b = as_array(b)
    n = min(len(a), len(b))
    if n == 0:
        return 0
    neq = a[:n] != b[:n]
    hit = np.flatnonzero(neq)
    return int(hit[0]) if hit.size else n


def common_prefix(*sequences):
    """Common prefix of all sequences passed (driver-side, template build).

    >>> common_prefix('abcdef', 'abc', 'abac')
    ['a', 'b']
    """
    out = []
    for group in zip(*sequences):
        head = group[0]
        if any(x != head for x in group[1:]):
            break
        out.append(head)
    return out


def _prefix_lengths(haystack: np.ndarray, needle: np.ndarray,
                    starts: np.ndarray) -> np.ndarray:
    """Common-prefix length of ``needle`` vs ``haystack[s:]`` for every s.

    Vectorized over all start positions; windows grow geometrically so the
    compare matrix stays small when matches are short (the typical case).
    """
    n = len(haystack)
    m = len(needle)
    lengths = np.zeros(len(starts), dtype=np.int64)
    live = np.arange(len(starts))
    offset = 0
    width = 8
    while live.size and offset < m:
        w = min(width, m - offset)
        idx = starts[live][:, None] + (offset + np.arange(w))[None, :]
        inside = idx < n
        window = haystack[np.minimum(idx, n - 1)]
        eq = (window == needle[offset:offset + w][None, :]) & inside
        matched_all = eq.all(axis=1)
        first_miss = np.where(matched_all, w, eq.argmin(axis=1))
        lengths[live] += first_miss
        live = live[matched_all]
        offset += w
        width *= 4
    return lengths


def match_candidates(to_search, subsequence, range_start=0, range_end=None):
    """All (position, match-length) pairs of ``subsequence`` against
    ``to_search`` with the match starting inside ``[range_start, range_end)``.

    Equivalent of the reference's ``naive_match_length`` generator, returned
    as a pair of arrays.  Positions are pre-filtered on the first token.
    """
    hay = as_array(to_search)
    pat = as_array(subsequence)
    if range_end is None:
        range_end = len(hay)
    range_start = max(range_start, 0)
    range_end = min(range_end, len(hay))
    if range_end <= range_start or len(pat) == 0:
        return _EMPTY_I64, _EMPTY_I64
    seg = hay[range_start:range_end]
    cand = np.flatnonzero(seg == pat[0]).astype(np.int64) + range_start
    if cand.size == 0:
        return _EMPTY_I64, _EMPTY_I64
    if len(pat) == 1:
        return cand, np.ones(cand.size, dtype=np.int64)
    if cand.size == 1:
        # single candidate (the common case after the first-token
        # prefilter): one straight prefix compare beats the windowed
        # multi-candidate kernel's fixed numpy-op overhead
        s = int(cand[0])
        n = min(len(hay) - s, len(pat))
        neq = hay[s:s + n] != pat[:n]
        first = int(neq.argmax())  # 0 when all-equal — disambiguate below
        length = first if neq[first] else n
        return cand, np.array([length], dtype=np.int64)
    return cand, _prefix_lengths(hay, pat, cand)


def longest_unique_subsequence(to_search, subsequence, range_start=0,
                               range_end=None):
    """Position+length of the longest match iff it is UNIQUE; ties → no match.

    >>> import numpy as np
    >>> hay = np.array([6, 3, 2, 4, 3, 2, 5])
    >>> longest_unique_subsequence(hay, np.array([2, 4, 3]))
    (2, 3)
    >>> longest_unique_subsequence(hay, np.array([3, 2]))
    (None, None)
    >>> longest_unique_subsequence(hay, np.array([3, 2]), 3)
    (4, 2)
    >>> longest_unique_subsequence(hay, np.array([3, 2]), 0, 2)
    (1, 2)
    """
    pos, lengths = match_candidates(to_search, subsequence, range_start,
                                    range_end)
    if pos.size == 0:
        return None, None
    if pos.size == 1:
        return int(pos[0]), int(lengths[0])
    best = lengths.max()
    where_best = np.flatnonzero(lengths == best)
    if where_best.size != 1:
        return None, None
    return int(pos[where_best[0]]), int(best)


def first_longest_subsequence(to_search, subsequence, range_start=0,
                              range_end=None):
    """Longest match; ties resolved to the earliest position.

    >>> first_longest_subsequence([6, 3, 2, 4, 3, 2, 5], [2, 4, 3])
    (2, 3)
    >>> first_longest_subsequence([6, 3, 2, 4, 3, 2, 5], [3, 2])
    (1, 2)
    >>> first_longest_subsequence([], [3, 2])
    (None, None)
    """
    pos, lengths = match_candidates(to_search, subsequence, range_start,
                                    range_end)
    if pos.size == 0:
        return None, None
    i = int(np.argmax(lengths))  # argmax → first occurrence of the max
    return int(pos[i]), int(lengths[i])


def similar_region(page_tokens, template_tokens, region, range_start=0,
                   range_end=None, best_match=longest_unique_subsequence,
                   **kwargs):
    """Locate the page region most similar to a labelled template region.

    Returns ``(score, start_index, end_index)`` where score is the summed
    prefix+suffix match length; ``(0, None, None)`` when no unique match.

    Flow (kept exactly as the reference, similarity.py:125-182):
    longest-unique match of the *reversed* template prefix against the
    reversed page locates the region start; the suffix is then matched
    after it.  Zero-width regions (unpaired/generated tags) take the
    special branch where prefix and suffix must agree on a position.
    """
    page = as_array(page_tokens)
    tpl = as_array(template_tokens)
    n = len(page)
    if range_end is None:
        range_end = n

    rev_prefix = tpl[region.start::-1]
    rev_page = page[::-1]  # O(1) numpy view
    rpi, pscore = best_match(rev_page, rev_prefix, n - range_end,
                             n - range_start)
    # None → nothing matched; 0 → match at page end, no room for a suffix.
    if not rpi:
        return 0, None, None
    start = n - rpi - 1

    if region.end is None:
        return pscore, start, None
    if kwargs.get("suffix_max_length", None) == 0:
        return pscore, start, range_start + 1

    suffix = tpl[region.end:]

    if region.start == region.end:
        # zero-width region: suffix must land on the same position.
        # A missing suffix match scores -inf (the reference's py2-era
        # `None < int` semantics, which py3 would turn into a TypeError).
        sidx, sscore = best_match(page, suffix, start, range_end)
        s = -1 if sscore is None else sscore
        if sidx == start:
            return pscore + sscore, start, sidx
        if pscore > s:
            return pscore, start, start
        if s > pscore:
            return sscore, sidx, sidx
        return 0, None, None

    sidx, sscore = best_match(page, suffix, start + 1, range_end)
    if sidx is None:
        return 0, None, None
    return pscore + sscore, start, sidx
