"""Region extraction operator tree.

Parity target: ``scrapely/extraction/regionextract.py``.  A compiled
template yields a tree of extractors:

* :class:`SlotExtractor` — leaf; one annotation → (field, value) pairs
  (content between matched tokens, and/or start-tag attribute values).
* :class:`AffixExtractor` — char-level extraction for generated
  (inserted-tag) annotations via longest-unique prefix/suffix text.
* :class:`RepeatExtractor` — inferred repetition: scans the page for every
  prefix…suffix window and applies the inner extractor to each (the
  system's "explode"); windows are located with one vectorized
  sliding-window compare instead of a per-token Python loop.
* :class:`VariantRecordExtractor` — adjacent same-variant annotations as a
  nested sub-record under ``variants``.
* :class:`RecordExtractor` — recursive ordered search with range narrowing
  and backtracking (the IBL core); inherently sequential per page, parallel
  across pages.
* :class:`TemplateExtractor` — tree root; merges per-extractor dicts.

The whole tree is a plain picklable object graph built once on the driver
(`scrapely_spark.ibl.build_plans`) and broadcast to executors.
"""

from __future__ import annotations

import copy
import re
from itertools import groupby
from operator import ge, gt, le, lt

import numpy as np

from scrapely_spark.html.page import (
    FragmentedHtmlPageRegion,
    HtmlPageRegion,
)
from scrapely_spark.ibl.matching import (
    common_prefix,
    longest_unique_subsequence,
    similar_region,
)
from scrapely_spark.ibl.parsing import Region, Slot
from scrapely_spark.ibl.schema import FieldDescriptor

def _IDENTITY(x):  # the "html" pass-through validator; module-level so
    return x       # compiled plans stay plain-picklable for broadcast


_FALLBACK_DESCRIPTOR = FieldDescriptor("none", None)

_NEG_INF = float("-inf")


def _cmp(a, op, b) -> bool:
    """Compare treating None as -inf (open-ended regions sort first)."""
    return op(_NEG_INF if a is None else a, _NEG_INF if b is None else b)


def anchor(obj):
    """The labelled region of an extractor, or the region itself."""
    return getattr(obj, "slot", obj)


class _chain:
    """outer∘inner, short-circuiting on None (picklable, unlike a closure)."""

    def __init__(self, outer, inner):
        self.outer = outer
        self.inner = inner

    def __call__(self, x):
        y = self.inner(x)
        return self.outer(y) if y is not None else None


def collect_fields(pairs):
    """(name, value) pairs → {name: [values...]} preserving value order.

    >>> collect_fields([('name', 'sofa'), ('colour', 'red'), ('colour', 'green')]) \
        == {'name': ['sofa'], 'colour': ['red', 'green']}
    True
    """
    out = {}
    for name, value in sorted(pairs, key=lambda kv: kv[0]):
        out.setdefault(name, []).append(value)
    return out


class SlotExtractor:
    """Leaf extractor for one annotation slot."""

    def __init__(self, slot: Slot, descriptors=None):
        self.slot = slot
        descriptors = descriptors or {}

        if slot.field:
            d = descriptors.get(slot.field)
            self.content_validate = d.extractor if d else _IDENTITY
            self.extract = self._content

        if slot.attrs:
            self.attr_plan = []
            for html_attr, out_field in slot.attrs:
                d = descriptors.get(out_field)
                self.attr_plan.append(
                    (d.extractor if d else _IDENTITY, html_attr, out_field))
            self.extract = (self._both if slot.field else self._attributes)

    def _both(self, page, start, end, ignored_regions=None, **kw):
        return (self._content(page, start, end, ignored_regions)
                + self._attributes(page, start, end, ignored_regions))

    def _content(self, page, start, end, ignored_regions=None, **kw):
        """Chars strictly between the matched start/end tokens, minus holes."""
        if ignored_regions and (
                _cmp(start, le, ignored_regions[0].start)
                and _cmp(end, ge, ignored_regions[-1].end)):
            keep_starts = [start] + [r.end for r in ignored_regions
                                     if r.end is not None]
            keep_ends = [r.start for r in ignored_regions]
            if keep_starts[-1] is not None:
                keep_ends.append(end)
            spans = list(zip(keep_starts, keep_ends))
            if keep_ends[0] is None:
                spans = spans[1:]
            region = FragmentedHtmlPageRegion(
                page.page, [page.region_inside(a, b) for a, b in spans])
        else:
            region = page.region_inside(start, end)
        value = self.content_validate(region)
        return [(self.slot.field, value)] if value else []

    def _attributes(self, page, start, end, ignored_regions=None, **kw):
        out = []
        for validate, html_attr, out_field in self.attr_plan:
            raw = page.tag_at(start).attributes.get(html_attr)
            if raw:
                value = validate(HtmlPageRegion(page.page, raw))
                if value is not None:
                    out.append((out_field, value))
        return out

    @classmethod
    def build(cls, slots, descriptors=None):
        """Leaf extractors for every slot that extracts something."""
        descriptors = descriptors or {}
        return [cls._build_one(s, descriptors)
                for s in slots if s.field or s.attrs]

    @staticmethod
    def _build_one(slot, descriptors):
        if slot.affix is not None:
            affix_extract = AffixExtractor(
                slot.affix.prefix, slot.affix.follow).extract
            descriptors = dict(descriptors)
            d = copy.copy(descriptors.get(slot.field, _FALLBACK_DESCRIPTOR))
            d.extractor = _chain(d.extractor, affix_extract)
            descriptors[slot.field] = d
        return SlotExtractor(slot, descriptors)

    def extracted_item(self):
        return (self.slot.field, self.slot.attrs)

    def __repr__(self):
        return "SlotExtractor(%r tpl[%s:%s])" % (
            self.slot.field, self.slot.start, self.slot.end)


# nltk WordPunctTokenizer pattern, as in the reference (regionextract.py:592)
_WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+", re.UNICODE | re.MULTILINE | re.DOTALL)


class AffixExtractor:
    """Char-level extraction by longest-unique prefix/suffix text.

    >>> AffixExtractor('designed by ', '.').extract_text("by Marc Newson.")
    'Marc Newson'
    >>> AffixExtractor('designed by ').extract_text("by Marc Newson.")
    'Marc Newson.'
    >>> AffixExtractor(suffix='.').extract_text("by Marc Newson.")
    'by Marc Newson'
    >>> AffixExtractor('designed by').extract_text("y Marc Newson.") is None
    True
    """

    def __init__(self, prefix=None, suffix=None):
        self.prefix = (prefix or "")[::-1]
        self.suffix = suffix or ""
        self.minprefix = self._min_match(self.prefix)
        self.minsuffix = self._min_match(self.suffix)

    @staticmethod
    def _min_match(s: str) -> int:
        """Length of the first word/punct token — the minimum match."""
        tokens = _WORDPUNCT_RE.findall(s or "")
        return len(tokens[0]) if tokens else 0

    def extract(self, region):
        text = self.extract_text(region)
        return HtmlPageRegion(region.htmlpage, text) if text else None

    def extract_text(self, text):
        lo = 0
        if self.minprefix > 0:
            ridx, plen = longest_unique_subsequence(text[::-1], self.prefix)
            if plen is None or plen < self.minprefix:
                return None
            lo = -ridx
        if self.minsuffix == 0:
            return text[lo:]
        sidx, slen = longest_unique_subsequence(text[lo:], self.suffix)
        if slen is None or slen < self.minsuffix:
            return None
        return text[lo:lo + sidx]


def _window_hits(tokens: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """Boolean mask: position i True iff tokens[i:i+len(pattern)] == pattern.

    Vectorized sliding-window equality; empty patterns match everywhere.
    """
    n = len(tokens)
    m = len(pattern)
    if m == 0:
        return np.ones(n + 1, dtype=bool)
    if n < m:
        return np.zeros(max(n - m + 1, 0), dtype=bool)
    windows = np.lib.stride_tricks.sliding_window_view(tokens, m)
    return (windows == pattern[None, :]).all(axis=1)


class RepeatExtractor:
    """Repetition inferred from common separator prefix/suffix patterns."""

    def __init__(self, prefix, suffix, extractors):
        self.prefix = np.asarray(prefix, dtype=np.int64)
        self.suffix = np.asarray(suffix, dtype=np.int64)
        self.extractor = copy.copy(extractors[0])
        self.slot = copy.copy(self.extractor.slot)
        self.slot.end = extractors[-1].slot.end

    def extract(self, page, start, end, ignored_regions, **kw):
        tokens = page.tokens
        plen = len(self.prefix)
        slen = len(self.suffix)
        index = max(0, start - plen)
        max_index = min(len(tokens) - slen, end + slen)
        max_start = max_index - plen

        # vectorized window matches over ONLY the scanned range (every
        # queried window lies inside [lo, hi)), then the reference's
        # sequential consumption order; suffix hit positions are
        # computed once and consumed by binary search — the previous
        # whole-page masks plus a per-item O(n) flatnonzero made every
        # call O(page) even for a narrow repeat region
        lo = index
        hi = max(max_index + slen, lo)
        window = tokens[lo:hi]
        pre_hits = _window_hits(window, self.prefix)
        suf_pos = np.flatnonzero(_window_hits(window, self.suffix)) + lo

        out = []
        while index <= max_start:
            rel = index - lo
            if rel < len(pre_hits) and pre_hits[rel]:
                prefix_end = index + plen
                j = int(np.searchsorted(suf_pos, prefix_end))
                if j >= len(suf_pos) or suf_pos[j] > max_index:
                    break
                peek = int(suf_pos[j])
                out += self.extractor.extract(
                    page, prefix_end - 1, peek, ignored_regions,
                    suffix_max_length=slen)
                index = max(peek, index + 1)
            else:
                index += 1
        return out

    @staticmethod
    def apply(template, extractors):
        """Fuse runs of adjacent same-item extractors into repeats."""
        tokens = template.tokens
        result = []
        keyf = lambda e: (e.extracted_item(), e.slot.variant)  # noqa: E731
        for key, group in groupby(extractors, keyf):
            group = list(group)
            if key is None or len(group) == 1:
                result += group
                continue

            separators = [
                tokens[a.slot.end:b.slot.start + 1]
                for a, b in zip(group[:-1], group[1:])]

            first_start = group[0].slot.start
            lead_start = max(0, first_start - len(separators[0]))
            lead = tokens[lead_start:first_start + 1]
            prefix_pattern = list(reversed(common_prefix(
                *[list(reversed(list(s))) for s in [lead] + separators])))

            last_end = group[-1].slot.end
            tail = tokens[last_end:last_end + len(separators[-1])]
            suffix_pattern = common_prefix(
                *[list(s) for s in separators + [tail]])

            # acceptance heuristic kept verbatim: the combined pattern must
            # be at least as long as the separator count
            if len(prefix_pattern) + len(suffix_pattern) >= len(separators):
                result.append(
                    RepeatExtractor(prefix_pattern, suffix_pattern, group))
            else:
                result += group
        return result

    def extracted_item(self):
        return self.extractor.extracted_item()

    def __repr__(self):
        return "Repeat(%r)" % self.extractor


def _trace_event(page, extractor, start, end, pairs) -> str:
    """One execution-trace entry (role parity: the reference's
    TraceExtractor.summarize_trace, regionextract.py:490-529 — a debug
    aid, not a byte-parity surface)."""
    body = page.page.body
    frags = page.page.parsed_body
    text_start = frags[page.tok2frag[int(start)]].start
    text_end = frags[page.tok2frag[int(end if end is not None else -1)]].end
    snippet = "(...%s)%s(%s...)" % (
        body[max(text_start - 50, 0):text_start].replace("\n", " "),
        body[text_start:text_end],
        body[text_end:text_end + 50].replace("\n", " "))
    return ("%s page[%s:%s]\n\nhtml\n%s\n\nextracted\n%r" % (
        type(extractor).__name__, start, end, snippet,
        [(k, v) for k, v in pairs if k != "trace"]))


class RecordExtractor:
    """Recursive ordered similar-region search with backtracking."""

    def __init__(self, extractors, template_tokens):
        self.extractors = extractors
        self.template_tokens = template_tokens
        start = min(e.slot.start for e in extractors)
        end = max(e.slot.end for e in extractors)
        self.slot = Slot(start, end)
        self.best_match = longest_unique_subsequence

    @classmethod
    def apply(cls, template, extractors):
        return [cls(extractors, template.tokens)]

    def extract(self, page, start=0, end=None, ignored_regions=None, **kw):
        ordered = sorted(self.extractors + (ignored_regions or []),
                         key=lambda x: anchor(x).start)
        _, _, pairs = self._walk(page, ordered, start, end, **kw)

        # split out variant sub-records, preserving first-seen order
        variant_order = []
        variant_pairs = {}
        fields = []
        for key, value in pairs:
            if isinstance(key, int):
                if key in variant_pairs:
                    variant_pairs[key] += value
                else:
                    variant_order.append(key)
                    variant_pairs[key] = value
            else:
                fields.append((key, value))
        fields += [("variants", collect_fields(variant_pairs[v]))
                   for v in variant_order]
        return [collect_fields(fields)]

    def _walk(self, page, extractors, start, end, nested_regions=None,
              ignored_regions=None, **kw):
        """One step of the ordered search (regionextract.py:369-427).

        Returns (matched_start, matched_end, [(field, value)...]).  On a
        miss, extracts the following extractors first and retries the
        current one inside the remaining range (backtracking).
        """
        nested_regions = nested_regions or []
        ignored_regions = ignored_regions or []
        current, following = extractors[0], extractors[1:]

        # peel off extractors that begin inside the current region
        while following and _cmp(anchor(following[0]).start, lt,
                                 anchor(current).end):
            ex = following.pop(0)
            labelled = anchor(ex)
            if isinstance(labelled, Slot) or (
                    nested_regions
                    and _cmp(anchor(nested_regions[-1]).start, lt, labelled.start)
                    and _cmp(labelled.start, lt, anchor(nested_regions[-1]).end)):
                nested_regions.append(ex)
            else:
                ignored_regions.append(ex)

        pairs = []
        end_exclusive = None if end is None else end + 1
        labelled = anchor(current)
        score, found_start, found_end = similar_region(
            page.tokens, self.template_tokens, labelled, start,
            end_exclusive, self.best_match, **kw)

        if score > 0:
            if isinstance(labelled, Slot):
                holes = []
                cursor = found_start
                for region in ignored_regions:
                    s, a, b = similar_region(
                        page.tokens, self.template_tokens, region, cursor,
                        found_end, self.best_match, **kw)
                    if s > 0:
                        holes.append(Region(a, b))
                        cursor = b or cursor
                pairs = current.extract(page, found_start, found_end, holes,
                                        **kw)
                if pairs and current.slot.variant:
                    pairs = [(current.slot.variant, pairs)]
                if kw.get("trace") is not None:
                    kw["trace"].append(_trace_event(
                        page, current, found_start, found_end, pairs))

            if nested_regions:
                _, _, inner = self._walk(page, nested_regions, found_start,
                                         found_end, **kw)
                pairs += inner
            if following:
                _, _, later = self._walk(page, following,
                                         found_end or start, end, **kw)
                pairs += later

        elif following:
            # backtrack: anchor the later extractors first, then retry the
            # current one inside [start, their_start - 1]
            bound, _, later = self._walk(page, following, start, end, **kw)
            if bound is not None:
                found_start, found_end, pairs = self._walk(
                    page, [current], start, bound - 1, nested_regions,
                    ignored_regions, **kw)
            pairs += later
        elif nested_regions:
            _, _, inner = self._walk(page, nested_regions, start, end, **kw)
            pairs += inner

        return found_start, found_end, pairs

    def extracted_item(self):
        return [type(self).__name__] + sorted(
            (e.extracted_item() for e in self.extractors),
            key=lambda item: "" if item[0] is None else item[0])

    def __repr__(self):
        return "%s%r" % (type(self).__name__, self.extractors)


class VariantRecordExtractor(RecordExtractor):
    """Adjacent same-variant annotations → one ``variants`` sub-record."""

    def extract(self, page, start=0, end=None, ignored_regions=None, **kw):
        records = RecordExtractor.extract(self, page, start, end,
                                          ignored_regions, **kw)
        return [("variants", r["variants"][0]) for r in records if r]

    @classmethod
    def apply(cls, template, extractors):
        variantf = lambda e: e.slot.variant  # noqa: E731
        # a variant id whose members form ONE contiguous run is "adjacent"
        adjacent = set()
        for vid, _ in groupby(extractors, variantf):
            if not vid:
                continue
            if vid in adjacent:
                adjacent.remove(vid)
            else:
                adjacent.add(vid)
        result = []
        for vid, group in groupby(extractors, variantf):
            group = list(group)
            if vid in adjacent:
                result.append(cls(group, template.tokens))
            else:
                result += group
        return result


class TemplateExtractor:
    """Tree root: run each top-level extractor, merge dicts last-wins."""

    def __init__(self, template, extractors):
        self.template = template
        self.extractors = extractors

    def extract(self, page, start=0, end=None, **kw):
        items = []
        for ex in self.extractors:
            items.extend(ex.extract(page, start, end, self.template.ignored,
                                    **kw))
        merged = {}
        for d in items:
            merged.update(d)
        return [merged]

    def __repr__(self):
        return "TemplateExtractor(%r)" % self.extractors
