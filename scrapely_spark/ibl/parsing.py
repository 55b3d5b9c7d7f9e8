"""Template compilation and page tokenization.

Parity targets: ``scrapely/extraction/pageparsing.py`` and the container
classes in ``pageobjects.py``.  Two jobs:

* :func:`tokenize_page` — page HTML → (int64 token array, token→fragment
  index map).  This is the per-page hot path and runs inside the Arrow
  batch kernel with a *frozen* vocabulary.
* :func:`compile_template` — annotated template HTML → :class:`Template`
  (token array + sorted annotation slots + ignored regions + required
  fields).  Templates are few and small, so this runs once on the driver
  and the result is broadcast.

The template scan reproduces every quirk of the reference parser —
annotation JSON in ``data-scrapy-annotate`` (with ``&quot;`` unescaping),
``data-scrapy-ignore``/``-ignore-beneath`` regions (``<img>`` special
case), ``data-scrapy-replacement`` token rewriting, generated (inserted)
tags recording char-level prefix/suffix text, variant scoping, unpaired-tag
regions ended by structural tags, and ``p``/``option`` auto-close.
"""

from __future__ import annotations

import json

import numpy as np

from scrapely_spark.html.lexer import Tag, TAG_OPEN, TAG_CLOSE
from scrapely_spark.html.page import HtmlPage
from scrapely_spark.ibl.tokens import Vocab


class Region:
    """Token-index span; ``end`` may be None (open-ended ignore-beneath)."""

    __slots__ = ("start", "end")

    def __init__(self, start, end):
        self.start = start
        self.end = end

    def __repr__(self):
        return "Region(%s, %s)" % (self.start, self.end)


class Affix:
    """Char-level context of a generated annotation (prefix/follow text)."""

    __slots__ = ("prefix", "follow")

    def __init__(self, prefix=None, follow=None):
        self.prefix = prefix
        self.follow = follow

    def __repr__(self):
        return "Affix(%r..%r)" % (self.prefix, self.follow)


class Slot(Region):
    """One annotated region = one extractable field.

    ``field``   — name extracted from the region content (or None);
    ``attrs``   — [(tag attribute, output field)] extracted from the start tag;
    ``affix``   — char-level prefix/suffix for generated annotations;
    ``variant`` — variant group id (int) or None;
    ``meta``    — leftover annotation payload (unused by matching).
    """

    __slots__ = ("field", "attrs", "affix", "variant", "meta")

    def __init__(self, start, end, field=None, affix=None, attrs=None,
                 variant=None):
        Region.__init__(self, start, end)
        self.field = field
        self.affix = affix
        self.attrs = attrs or []
        self.variant = variant
        self.meta = {}

    def __repr__(self):
        return "Slot([%s:%s] field=%r attrs=%r variant=%r)" % (
            self.start, self.end, self.field, self.attrs, self.variant)


class Template:
    """Compiled template: broadcastable plan input."""

    __slots__ = ("page", "tokens", "slots", "ignored", "required", "id")

    def __init__(self, page, tokens, slots, ignored, required, template_id):
        self.page = page
        self.tokens = np.asarray(tokens, dtype=np.int64)
        # order: start ascending, then end descending (two stable sorts)
        slots = sorted(slots, key=lambda s: -1 if s.end is None else s.end,
                       reverse=True)
        self.slots = sorted(slots, key=lambda s: s.start)
        self.ignored = [r if isinstance(r, Region) else Region(*r)
                        for r in (ignored or [])]
        self.required = set(required or [])
        self.id = template_id


class TokenizedPage:
    """Extraction-side page: tokens + token→fragment index map."""

    __slots__ = ("page", "tokens", "tok2frag")

    def __init__(self, page, tokens, tok2frag):
        self.page = page
        self.tokens = np.asarray(tokens, dtype=np.int64)
        self.tok2frag = tok2frag

    def region_inside(self, start_tok: int, end_tok: int):
        """Char region strictly between the tokens at the given indexes."""
        return self.page.subregion(self.tok2frag[start_tok] + 1,
                                   self.tok2frag[end_tok] - 1)

    def tag_at(self, tok_index: int) -> Tag:
        return self.page.parsed_body[self.tok2frag[tok_index]]


def tokenize_page(page: HtmlPage, vocab: Vocab) -> TokenizedPage:
    """Tokenize a page for extraction (tags only; text skipped)."""
    tokens = []
    tok2frag = []
    for index, frag in enumerate(page.parsed_body):
        if isinstance(frag, Tag):
            tokens.append(vocab.token_id(frag.name, frag.kind))
            tok2frag.append(index)
    return TokenizedPage(page, tokens, tok2frag)


# tags that terminate an unpaired-tag annotation region
_UNPAIRED_REGION_ENDERS = frozenset(["form", "div", "p", "table", "tr", "td"])
# opening tag → tags it implicitly closes
_AUTOCLOSE_ON_OPEN = {"p": ["p"], "option": ["option"]}
# closing tag → tags it implicitly closes
_AUTOCLOSE_ON_CLOSE = {"select": ["option"]}

_ANNOTATE_ATTR = "data-scrapy-annotate"
_IGNORE_ATTR = "data-scrapy-ignore"
_IGNORE_BENEATH_ATTR = "data-scrapy-ignore-beneath"
_REPLACEMENT_ATTR = "data-scrapy-replacement"


def _annotation_payload(tag: Tag):
    raw = tag.attributes.get(_ANNOTATE_ATTR)
    if raw is None:
        return None
    return json.loads(raw.replace("&quot;", '"'))


def _flag(tag: Tag, attr: str) -> bool:
    return tag.attributes.get(attr) == "true"


class _TemplateScan:
    """Single pass over a template's fragment stream building the plan."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.tokens = []
        self.slots = []
        self.ignored = []
        self.required = []
        self.ignored_stacks = {}      # tag name → [Tag|None]
        self.labelled_stacks = {}     # tag name → [Slot|None]
        self.replacement_stacks = {}  # tag name → [str|None]
        self.unpaired_stack = []      # [Slot, following open tag names...]
        self.variant_stack = []
        self.prev_text = None
        self.open_affix_slot = None   # slot awaiting its follow text
        self.prev_was_tag = False
        self.tag_index = 0

    def run(self, page: HtmlPage) -> Template:
        self.page = page
        for frag in page.parsed_body:
            if isinstance(frag, Tag):
                self.tokens.append(self.vocab.token_id(frag.name, frag.kind))
                self._on_tag(frag)
                self.prev_was_tag = True
            else:
                self._on_text(page.fragment_data(frag))
                self.prev_was_tag = False
        return Template(page, self.tokens, self.slots, self.ignored,
                        self.required, page.page_id)

    # -- text ---------------------------------------------------------------

    def _on_text(self, text: str):
        if self.open_affix_slot is not None:
            self.open_affix_slot.affix.follow = text
            self.open_affix_slot = None
        self.prev_text = text

    # -- tags ---------------------------------------------------------------

    def _on_tag(self, tag: Tag):
        if self.open_affix_slot is not None:
            self._on_text("")
        if tag.kind == TAG_OPEN:
            self._on_open(tag)
        elif tag.kind == TAG_CLOSE:
            self._on_close(tag)
        else:
            self._on_unpaired(tag)

    def _seal_unpaired(self):
        self.unpaired_stack[0].end = self.tag_index
        self.unpaired_stack = []

    def _on_unpaired(self, tag: Tag):
        if _flag(tag, _IGNORE_ATTR) and tag.name == "img":
            self.ignored.append((self.tag_index, self.tag_index + 1))
        elif _flag(tag, _IGNORE_BENEATH_ATTR):
            self.ignored.append((self.tag_index, None))
        payload = _annotation_payload(tag)
        if payload:
            if self.unpaired_stack:
                self._seal_unpaired()
            slot = Slot(self.tag_index, self.tag_index + 1)
            field_map = payload.pop("annotations", {}).items()
            content_key = payload.pop("text-content", "content")
            for out_field, target in field_map:
                if out_field == content_key:
                    slot.field = target
                    self.unpaired_stack.append(slot)
                else:
                    slot.attrs.append((out_field, target))
            self.slots.append(slot)
            self.required.extend(payload.pop("required", []))
            variant = payload.pop("variant", 0)
            if variant > 0:
                slot.variant = variant
            if payload.pop("generated", False):
                raise ValueError("generated annotation on unpaired tag")
            slot.meta = payload
        self.tag_index += 1

    def _on_open(self, tag: Tag):
        if _flag(tag, _IGNORE_ATTR):
            if tag.name == "img":
                self.ignored.append((self.tag_index, self.tag_index + 1))
            else:
                self.ignored.append((self.tag_index, None))
                self.ignored_stacks.setdefault(tag.name, []).append(tag)
        elif self.ignored_stacks.get(tag.name):
            self.ignored_stacks[tag.name].append(None)
        if _flag(tag, _IGNORE_BENEATH_ATTR):
            self.ignored.append((self.tag_index, None))

        replacement = tag.attributes.pop(_REPLACEMENT_ATTR, None)
        if replacement:
            self.tokens.pop()
            self.tokens.append(self.vocab.token_id(replacement, tag.kind))
            self.replacement_stacks.setdefault(tag.name, []).append(replacement)
        elif tag.name in self.replacement_stacks:
            self.replacement_stacks[tag.name].append(None)

        if self.unpaired_stack:
            if tag.name in _UNPAIRED_REGION_ENDERS:
                self._seal_unpaired()
            else:
                self.unpaired_stack.append(tag.name)

        effective = replacement or self._pop_replacement(tag)
        self._autoclose(effective, _AUTOCLOSE_ON_OPEN)

        payload = _annotation_payload(tag)
        if not payload:
            if effective in self.labelled_stacks:
                self.labelled_stacks[effective].append(None)
            self.tag_index += 1
            return

        slot = Slot(self.tag_index, None)
        if payload.pop("generated", False):
            # inserted tag: remove its token and record char-level context
            self.tokens.pop()
            slot.start -= 1
            slot.affix = Affix("" if self.prev_was_tag else self.prev_text)
            if _flag(tag, _IGNORE_ATTR) or _flag(tag, _IGNORE_BENEATH_ATTR):
                last = self.ignored.pop()
                self.ignored.append((last[0] - 1, last[1]))

        self.required.extend(payload.pop("required", []))

        field_map = payload.pop("annotations", {}).items()
        content_key = payload.pop("text-content", "content")
        for out_field, target in field_map:
            if out_field == content_key:
                slot.field = target
            else:
                slot.attrs.append((out_field, target))

        variant = payload.pop("variant", 0)
        if variant > 0:
            if slot.field is not None:
                self.variant_stack.append(variant)
            else:
                slot.variant = variant

        slot.meta = payload

        if slot.affix is None:
            self.tag_index += 1
        if self.variant_stack and slot.variant is None:
            variant = self.variant_stack[-1]
            slot.variant = None if variant == "0" else variant

        if slot.field:
            # wait for the matching close tag
            self.labelled_stacks.setdefault(effective, []).append(slot)
        else:
            slot.end = slot.start + 1
            self.slots.append(slot)

    def _on_close(self, tag: Tag):
        if self.unpaired_stack:
            if tag.name == self.unpaired_stack[-1]:
                self.unpaired_stack.pop()
            else:
                self._seal_unpaired()

        ignored_stack = self.ignored_stacks.get(tag.name)
        if ignored_stack is not None:
            opener = ignored_stack.pop()
            if isinstance(opener, Tag):
                for i in range(len(self.ignored) - 1, -1, -1):
                    if self.ignored[i][1] is None:
                        self.ignored[i] = (self.ignored[i][0], self.tag_index)
                        break
            if not ignored_stack:
                del self.ignored_stacks[tag.name]

        effective = self._pop_replacement(tag)
        self._autoclose(effective, _AUTOCLOSE_ON_CLOSE)

        stack = self.labelled_stacks.get(effective)
        if stack is None:
            self.tag_index += 1
            return
        slot = stack.pop()
        if slot is None:
            self.tag_index += 1
        else:
            slot.end = self.tag_index
            self.slots.append(slot)
            if slot.affix is not None:
                # generated close tag: drop its token, await follow text
                self.tokens.pop()
                self.open_affix_slot = slot
            else:
                self.tag_index += 1
            if not stack:
                del self.labelled_stacks[effective]
            if slot.variant and self.variant_stack:
                if self.variant_stack.pop() != slot.variant:
                    raise ValueError("unbalanced variant annotation tags")

    def _pop_replacement(self, tag: Tag) -> str:
        """Resolve the effective tag name through the replacement stack.

        The popped value is returned VERBATIM, including None/'' — the
        reference (pageparsing.py:289 _update_replacement_stack) files
        annotations under that falsy key, where no close tag ever
        completes them (the annotation is dropped); resolving to
        tag.name instead completed those annotations and produced
        extra slots the reference never emits (193/4000 fuzz templates
        diverged before this fix, 0 after).
        """
        effective = tag.name
        stack = self.replacement_stacks.get(tag.name)
        if stack is not None:
            replacement = stack.pop()
            if replacement:
                self.tokens.pop()
                self.tokens.append(self.vocab.token_id(replacement, tag.kind))
            effective = replacement
            if not stack:
                del self.replacement_stacks[tag.name]
        return effective

    def _autoclose(self, name: str, rules: dict):
        """p-inside-p / option-inside-select implicit closing."""
        if name in rules:
            for victim in rules[name]:
                if victim in self.labelled_stacks:
                    slot = self.labelled_stacks.pop(victim)[0]
                    slot.end = self.tag_index
                    self.slots.append(slot)
                    break


def compile_template(page: HtmlPage, vocab: Vocab) -> Template:
    """Template HTML → compiled :class:`Template` (driver-side)."""
    return _TemplateScan(vocab).run(page)
