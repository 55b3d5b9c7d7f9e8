"""Regex-driven HTML lexer.

Produces the exact fragment stream the reference produces
(``scrapely/htmlpage.py:93-165``, pure-python ``parse_html``): a flat
sequence of text/comment/script fragments and tags, never a DOM.  The
grammar below is the *specification* of that lexer (the regexes define the
language accepted); the surrounding code is original.

Semantics preserved bit-for-bit (verified by parity tests that run the
reference side-by-side on its own sample corpus):

* a leading ``<!DOCTYPE ...>`` is skipped;
* gaps between matches become text fragments with ``is_text=True``;
* comments / processing instructions are fragments with ``is_text=False``;
* ``<script>`` bodies are split around embedded comments, every piece
  ``is_text=False``;
* tag names are lowercased; repeated attributes keep the first value.

This lexer is the per-page inner loop of the Arrow-batched extraction UDF
(`scrapely_spark.spark.extract`): it is called once per page *within* a
batch, with all regex work in the compiled ``re`` engine.
"""

from __future__ import annotations

import re

TAG_OPEN = 1
TAG_CLOSE = 2
TAG_UNPAIRED = 3

_ATTR_SRC = (
    r"((?:[^=/<>\s]|/(?!>))+)"
    r"(?:\s*=(?:\s*\"(.*?)\"|\s*'(.*?)'|([^>\s]+))?)?"
)
_TAG_SRC = r"<(\/?)(\w+(?::\w+)?)((?:\s*" + _ATTR_SRC + r")+\s*|\s*)(\/?)>?"
_SCRIPT_SRC = r"(<script.*?>)(.*?)(</script.*?>)"
_COMMENT_SRC = r"(<!--.*?--!?>|<\?.+?>|<!>)"

_MARKUP_RE = re.compile(
    "%s|%s|%s" % (_COMMENT_SRC, _SCRIPT_SRC, _TAG_SRC), re.I | re.DOTALL
)
_ATTR_RE = re.compile(_ATTR_SRC, re.I | re.DOTALL)
_DOCTYPE_RE = re.compile(r"(?:<!DOCTYPE.*?>)")
_COMMENT_RE = re.compile(_COMMENT_SRC, re.DOTALL)


class Frag:
    """Half-open char span ``[start, end)`` into the page body."""

    __slots__ = ("start", "end", "is_text")

    def __init__(self, start: int, end: int, is_text: bool = False):
        self.start = start
        self.end = end
        self.is_text = is_text

    # compatibility alias used by scalar functions ported from the reference
    @property
    def is_text_content(self) -> bool:
        return self.is_text

    def __repr__(self):
        return "Frag(%d, %d, text=%s)" % (self.start, self.end, self.is_text)


class Tag(Frag):
    """A lexed tag; attributes parse lazily (first duplicate wins)."""

    __slots__ = ("kind", "name", "_attr_src", "_attrs")

    def __init__(self, kind: int, name: str, attr_src, start: int, end: int):
        Frag.__init__(self, start, end, False)
        self.kind = kind
        self.name = name
        if isinstance(attr_src, dict):
            self._attrs = attr_src
            self._attr_src = None
        else:
            self._attrs = None
            self._attr_src = attr_src

    # reference-compatible aliases (scrapely/htmlpage.py:44-78)
    @property
    def tag(self) -> str:
        return self.name

    @property
    def tag_type(self) -> int:
        return self.kind

    @property
    def attributes(self) -> dict:
        if self._attrs is None:
            attrs: dict = {}
            for m in _ATTR_RE.findall(self._attr_src or ""):
                key = m[0].lower()
                if key in attrs:
                    continue  # HTML spec: first occurrence wins
                val = None
                for candidate in m[1:]:
                    if candidate:
                        val = candidate
                        break
                attrs[key] = val
            self._attrs = attrs
        return self._attrs

    def __repr__(self):
        return "Tag(<%s%s> kind=%d [%d:%d])" % (
            "/" if self.kind == TAG_CLOSE else "",
            self.name,
            self.kind,
            self.start,
            self.end,
        )


def _tag_from_match(m, groups=None) -> Tag:
    if groups is None:
        groups = m.groups()
    closing, name, attr_src = groups[4:7]
    if name is None:  # comment alternative matched
        return None
    if closing:
        kind = TAG_CLOSE
    elif groups[-1]:
        kind = TAG_UNPAIRED
    else:
        kind = TAG_OPEN
    return Tag(kind, name.lower(), attr_src, m.start(), m.end())


def _lex_script(m):
    """Split one ``<script>...</script>`` match into open/body/close frags."""
    open_src, body_src, close_src = m.groups()[1:4]

    open_tag = _tag_from_match(_MARKUP_RE.match(open_src))
    open_tag.start = m.start()
    open_tag.end = m.start() + len(open_src)

    close_tag = _tag_from_match(_MARKUP_RE.match(close_src))
    close_tag.start = m.end() - len(close_src)
    close_tag.end = m.end()

    yield open_tag
    if open_tag.end < close_tag.start:
        cursor = 0
        for cm in _COMMENT_RE.finditer(body_src):
            if cm.start() > cursor:
                yield Frag(open_tag.end + cursor, open_tag.end + cm.start())
            yield Frag(open_tag.end + cm.start(), open_tag.end + cm.end())
            cursor = cm.end()
        if open_tag.end + cursor < close_tag.start:
            yield Frag(open_tag.end + cursor, close_tag.start)
    yield close_tag


def lex(text: str):
    """Lex ``text`` into a generator of :class:`Frag` / :class:`Tag`.

    Parity target: ``scrapely/htmlpage.py:93-120`` (``parse_html``).
    """
    cursor = 0
    dm = _DOCTYPE_RE.match(text)
    if dm:
        cursor = dm.end()
    prev_end = cursor
    for m in _MARKUP_RE.finditer(text, cursor):
        if m.start() > prev_end:
            yield Frag(prev_end, m.start(), True)
        g = m.groups()
        if g[0] is not None:
            yield Frag(m.start(), m.end())  # comment / PI
        elif g[1] is not None:
            for piece in _lex_script(m):
                yield piece
        else:
            yield _tag_from_match(m, g)
        prev_end = m.end()
    if prev_end < len(text):
        yield Frag(prev_end, len(text), True)
