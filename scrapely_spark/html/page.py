"""Page containers and extracted-region types.

Role parity with ``scrapely/htmlpage.py:231-343``: a page is url + headers +
unicode body + lazily-lexed fragment list; extracted values are unicode
subclasses that remember their source page so scalar refinement functions
(`scrapely_spark.functions`) can re-walk markup.

In the Spark engine a page is one row of the ``pages`` DataFrame
(`url, page_id, headers, body, encoding`); these objects exist only
*inside* the Arrow-batched kernel, never as a distributed datatype.
"""

from __future__ import annotations

import hashlib

from scrapely_spark.html.lexer import Frag, Tag, lex


class HtmlPage:
    """A lexed HTML page. Assigning ``body`` re-lexes eagerly."""

    def __init__(self, url=None, headers=None, body=None, page_id=None,
                 encoding: str = "utf-8"):
        if not isinstance(body, str):
            raise TypeError("unicode body expected, got %s" % type(body).__name__)
        self.headers = headers or {}
        self.body = body
        self.url = url or ""
        self.encoding = encoding
        if page_id is None and url:
            self.page_id = hashlib.sha1(url.encode(self.encoding)).hexdigest()
        else:
            self.page_id = page_id

    @property
    def body(self) -> str:
        return self._body

    @body.setter
    def body(self, value: str):
        self._body = value
        self.parsed_body = list(lex(value))

    def fragment_data(self, frag: Frag) -> str:
        return self._body[frag.start:frag.end]

    def subregion(self, start: int = 0, end=None) -> "HtmlPageParsedRegion":
        """Region spanning fragment indexes ``start..end`` (inclusive)."""
        return HtmlPageParsedRegion(self, start, end)


class TextPage(HtmlPage):
    """A 'page' holding plain text as a single text fragment (no re-lex)."""

    @HtmlPage.body.setter
    def body(self, value: str):
        self._body = value
        self.parsed_body = [Frag(0, len(value), True)]


class HtmlPageRegion(str):
    """An extracted value: a unicode string carrying its source page."""

    def __new__(cls, htmlpage, data):
        return str.__new__(cls, data)

    def __init__(self, htmlpage, data):
        self.htmlpage = htmlpage

    @property
    def text_content(self):
        return self


class HtmlPageParsedRegion(HtmlPageRegion):
    """Contiguous region addressed by fragment indexes (end inclusive)."""

    def __new__(cls, htmlpage, start_index, end_index):
        text = htmlpage.body
        if text:
            lo = htmlpage.parsed_body[start_index].start
            # reference-faithful falsy-zero quirk (htmlpage.py:
            # `end_index or -1`): a region ENDING at fragment index 0
            # slices through the LAST fragment's end — the page tail —
            # not an empty string; 75/3000 fuzzed template/page pairs
            # diverged under `is not None` before this fix, 0 after
            hi = htmlpage.parsed_body[end_index or -1].end
            text = text[lo:hi]
        return HtmlPageRegion.__new__(cls, htmlpage, text)

    def __init__(self, htmlpage, start_index, end_index):
        self.htmlpage = htmlpage
        self.start_index = start_index
        self.end_index = end_index

    @property
    def parsed_fragments(self):
        hi = self.end_index + 1 if self.end_index is not None else None
        return self.htmlpage.parsed_body[self.start_index:hi]

    @property
    def text_content(self):
        """Concatenated text fragments (tags and non-text spans skipped)."""
        joined = " ".join(
            self.htmlpage.body[f.start:f.end]
            for f in self.parsed_fragments
            if not isinstance(f, Tag) and f.is_text
        )
        return TextPage(self.htmlpage.url, self.htmlpage.headers, joined,
                        encoding=self.htmlpage.encoding).subregion()


class FragmentedHtmlPageRegion(HtmlPageParsedRegion, HtmlPageRegion):
    """A region with holes (ignored sub-regions removed)."""

    def __new__(cls, htmlpage, regions):
        return HtmlPageRegion.__new__(cls, htmlpage, "".join(regions))

    def __init__(self, htmlpage, regions):
        self.htmlpage = htmlpage
        self.regions = regions

    @property
    def parsed_fragments(self):
        out = []
        for r in self.regions:
            out.extend(r.parsed_fragments)
        return out


def url_to_page(url: str, encoding=None,
                default_encoding: str = "utf-8") -> HtmlPage:
    """Fetch a URL into an HtmlPage (role parity: htmlpage.py:168-198).

    Real crawling in the Spark engine replays from a fetch store
    (`scrapely_spark.frontier.rounds`); this single-URL path exists for
    API completeness and the CLI tool, and needs network access.
    """
    from urllib.request import urlopen

    from scrapely_spark.html.entities import html_to_unicode

    fh = urlopen(url)
    raw = fh.read()
    headers = dict(fh.headers.items())
    if encoding is None:
        encoding, body = html_to_unicode(
            headers.get("Content-Type"), raw, default_encoding)
    else:
        body = raw.decode(encoding)
    return HtmlPage(fh.geturl(), headers=headers, body=body,
                    encoding=encoding)


def dict_to_page(obj: dict, body_key: str = "body") -> HtmlPage:
    """Row/dict → HtmlPage (inverse of :func:`page_to_dict`)."""
    return HtmlPage(
        obj["url"],
        obj.get("headers"),
        obj[body_key],
        obj.get("page_id"),
        obj.get("encoding", "utf-8"),
    )


def page_to_dict(page: HtmlPage, body_key: str = "body") -> dict:
    return {
        "url": page.url,
        "headers": page.headers,
        body_key: page.body,
        "page_id": page.page_id,
        "encoding": page.encoding,
    }
