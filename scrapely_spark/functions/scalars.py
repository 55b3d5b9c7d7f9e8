"""Scalar refinement functions applied to extracted regions.

Parity target: ``scrapely/extractors.py`` (the reference's entire scalar
function library).  Each is a unary ``str → str|None`` used as a field
descriptor's extractor; inside the Spark engine they run per-value inside
the Arrow batch kernel (the values are already tiny snippets by the time
these run).  Several have pure-DataFrame equivalents for column-level use —
see ``scrapely_spark.spark.textstats`` — but extraction-time behavior must
be bit-exact with the reference, so these are the canonical versions.

Doctest expectations below mirror the reference's own doctests; the parity
suite also runs the reference implementation side-by-side.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse, urlunparse

from scrapely_spark.html.entities import (
    replace_entities,
    remove_comments,
    safe_url_string,
)
from scrapely_spark.html.lexer import Tag, TAG_OPEN, TAG_CLOSE, TAG_UNPAIRED
from scrapely_spark.html.page import HtmlPage

_NUMERIC_ENTITY_RE = re.compile(r"&#([0-9]+)(?:;|\s)", re.U)
_PRICE_RE = re.compile(r"(?:^|[^a-zA-Z0-9])(\d+(?:\.\d+)?)(?:$|[^a-zA-Z0-9])")
_NUMBER_RE = re.compile(r"(-?\d+(?:\.\d+)?)")
_DECIMAL_RE = re.compile(r"(-?\d[\d\,\.]*)", re.U | re.M)
_WS_RE = re.compile(r"\s+", re.U)

_IMAGE_EXTS = (
    "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp", "tif",
    "tiff", "ai", "drw", "dxf", "eps", "ps", "svg",
)
_CSS_URL_RE = re.compile(r"background(?:-image)?\s*:\s*url\((.*?)\)", re.I)
_PATH_TEMPLATE = r"/?(?:[^/]+/)*(?:.+%s)"
_IMAGE_PATH_RE = re.compile(
    _PATH_TEMPLATE % (r"\.(?:%s)" % "|".join(_IMAGE_EXTS)), re.I)
_ANY_PATH_RE = re.compile(_PATH_TEMPLATE % "", re.I)

# --- safehtml policy tables --------------------------------------------------

KEEP_TAGS = frozenset([
    "br", "p", "big", "em", "small", "strong", "sub", "sup", "ins", "del",
    "code", "kbd", "samp", "tt", "var", "pre", "listing", "plaintext",
    "abbr", "acronym", "address", "bdo", "blockquote", "q", "cite", "dfn",
    "table", "tr", "th", "td", "tbody", "ul", "ol", "li", "dl", "dd", "dt",
])
RENAME_TAGS = {
    "h1": "strong", "h2": "strong", "h3": "strong", "h4": "strong",
    "h5": "strong", "h6": "strong", "b": "strong", "i": "em",
}
PURGE_TAGS = ("script", "style", "img", "input")
VOID_TAGS = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "keygen",
    "link", "meta", "param", "source", "track", "wbr",
])


def htmlregion(text: str):
    """Make an HtmlPageRegion from raw text (testing convenience)."""
    return HtmlPage(body=text).subregion()


def notags(region, tag_replace: str = " "):
    """Remove markup, joining non-tag fragment data with ``tag_replace``."""
    fragments = getattr(region, "parsed_fragments", None)
    if fragments is None:
        return region
    page = region.htmlpage
    return tag_replace.join(
        page.fragment_data(f) for f in fragments if not isinstance(f, Tag))


def text(region):
    """HTML → plain text: entities decoded, whitespace collapsed.

    >>> t = lambda s: text(htmlregion(s))
    >>> t('<h1>test</h1>')
    'test'
    >>> t('<h1> test</h1> ')
    'test'
    >>> t('test <!-- this is a comment --> me')
    'test me'
    >>> t("scripts are<script>n't</script> ignored")
    'scripts are ignored'
    >>> t("only &pound;42")
    'only \\xa342'
    >>> t("<p>The text</p><?xml:namespace blabla/><p>is here</p>")
    'The text is here'
    """
    decoded = replace_entities(region.text_content,
                               encoding=region.htmlpage.encoding)
    return _WS_RE.sub(" ", decoded).strip()


def _walk_markup(region, textf, tagf, purge_tags=PURGE_TAGS):
    """Yield transformed markup pieces, skipping purged subtrees."""
    fragments = getattr(region, "parsed_fragments", None)
    if fragments is None:
        yield textf(region)
        return
    fiter = iter(fragments)
    for frag in fiter:
        if isinstance(frag, Tag):
            if frag.name in purge_tags:
                if frag.kind == TAG_OPEN and frag.name not in VOID_TAGS:
                    for probe in fiter:  # skip to the matching close
                        if (isinstance(probe, Tag) and probe.name == frag.name
                                and probe.kind == TAG_CLOSE):
                            break
            else:
                piece = tagf(frag)
                if piece:
                    yield piece
        else:
            data = remove_comments(region.htmlpage.fragment_data(frag))
            data = textf(data)
            if data:
                yield data


def safehtml(region, allowed_tags=KEEP_TAGS, replace_tags=RENAME_TAGS,
             tags_to_purge=PURGE_TAGS):
    """Whitelist-sanitize HTML.

    >>> t = lambda s, keep=KEEP_TAGS: safehtml(htmlregion(s), keep)
    >>> t('<strong>test <blink>test</blink></strong>')
    '<strong>test test</strong>'
    >>> t('<script>test </script>test')
    'test'
    >>> t('<h2>header</h2> test <b>bold</b> <i>indent</i>')
    '<strong>header</strong> test <strong>bold</strong> <em>indent</em>'
    >>> t('<p>test <script>test</script></p>')
    '<p>test </p>'
    >>> t('<!-- comment --> only &pound;42')
    'only &pound;42'
    >>> t('<p>test')
    '<p>test</p>'
    >>> t('<p>test <i><br/><b>test</p>')
    '<p>test <em><br/><strong>test</strong></em></p>'
    >>> t('Keep content around <img src="image.jpg"> <b>img</b> tag')
    'Keep content around  <strong>img</strong> tag'
    """
    open_stack = []

    def _tag_piece(tag: Tag):
        name = replace_tags.get(tag.name, tag.name)
        if name not in allowed_tags:
            return None
        if tag.kind == TAG_OPEN:
            if tag.name not in VOID_TAGS:
                open_stack.append(name)
            return "<%s>" % name
        if tag.kind == TAG_CLOSE:
            try:
                last = open_stack.pop()
                if last == name:
                    return "</%s>" % last
                # close every dangling tag down to the matching one
                rev = open_stack[::-1]
                depth = rev.index(name)
                del open_stack[-depth - 1:]
                return "</%s></%s>" % (last, "></".join(rev[:depth + 1]))
            except (ValueError, IndexError):
                return None
        return "<%s/>" % tag.name  # unpaired

    pieces = list(_walk_markup(region, lambda s: s, _tag_piece,
                               tags_to_purge))
    pieces += ["</%s>" % name for name in reversed(open_stack)]
    return "".join(pieces).strip()


def html(region):
    """Identity — the region already is html."""
    return region


def contains_any_numbers(txt):
    """Pass-through iff the text contains at least one number.

    >>> contains_any_numbers('foo')
    >>> contains_any_numbers('$67 at 15% discount')
    '$67 at 15% discount'
    """
    if _NUMBER_RE.search(txt) is not None:
        return txt


def contains_prices(txt):
    """Pass-through iff the text has a number not joined to letters."""
    if _PRICE_RE.findall(txt) is not None:
        return txt


def contains_numbers(txt, count=1):
    """Pass-through iff the text has exactly ``count`` numbers.

    >>> contains_numbers('foo', 2)
    >>> contains_numbers('this 1 has 2 numbers', 2)
    'this 1 has 2 numbers'
    """
    if len(_NUMBER_RE.findall(txt)) == count:
        return txt


def _decode_numeric_entities(txt: str) -> str:
    return _NUMERIC_ENTITY_RE.sub(lambda m: chr(int(m.group(1))), txt)


def extract_number(txt):
    """The single numeric value in the text, else None.

    >>> extract_number('  -45.3')
    '-45.3'
    >>> extract_number('  +45.3')
    '45.3'
    >>> extract_number('  45.3, 7')
    >>> extract_number('&#163;129&#46;99')
    '129.99'
    """
    numbers = _NUMBER_RE.findall(_decode_numeric_entities(txt))
    if len(numbers) == 1:
        return numbers[0]


def extract_price(txt):
    """Locale-aware price normalization (last separator wins).

    >>> extract_price('asdf 234,234.45sdf ')
    '234234.45'
    >>> extract_price('234,23')
    '234.23'
    >>> extract_price('234,230')
    '234230'
    >>> extract_price('1,000,000.00')
    '1000000.00'
    >>> extract_price('1000,00')
    '1000.00'
    >>> extract_price('500.000,00')
    '500000.00'
    >>> extract_price('500 000,00')
    '500000.00'
    >>> extract_price('&#163;129&#46;99')
    '129.99'
    >>> extract_price('adsfg')
    >>> extract_price('')
    """
    txt = _decode_numeric_entities(txt).replace(" ", "")
    m = _DECIMAL_RE.search(txt)
    if not m:
        return None
    value = m.group(1)
    last_dot = value.rfind(".")
    last_comma = value.rfind(",")
    comma_is_decimal = False
    if last_dot > 0 and last_comma > 0:
        comma_is_decimal = last_comma > last_dot
    elif last_comma > 0:
        first_comma = value.find(",")
        if first_comma == last_comma and len(value) - last_comma <= 3:
            comma_is_decimal = True
    if comma_is_decimal:
        value = value.replace(".", "")
    else:
        value = value.replace(",", "")
    return value.replace(",", ".")


def url(txt):
    """Trim surrounding whitespace/quotes; None when empty."""
    txt = txt.strip("\t\r\n '\"")
    if txt:
        return txt


def extract_image_url(txt):
    """Pull an image URL out of text or ``background(-image): url(...)`` CSS."""
    txt = url(txt)
    if not txt:
        return None
    m = _CSS_URL_RE.search(txt)
    if m:
        txt = m.group(1)
    parsed = urlparse(txt)
    path = None
    m = _IMAGE_PATH_RE.search(parsed.path)
    if m:
        path = m.group()
    elif parsed.query:
        m = _ANY_PATH_RE.search(parsed.path)
        if m:
            path = m.group()
    result = None
    if path is not None:
        parts = list(parsed)
        parts[2] = path
        result = urlunparse(parts)
    return result or txt


def image_url(txt):
    """Extract and escape an image URL, as a single-element list.

    >>> image_url('')
    >>> image_url('foo-bar.jpg')
    ['foo-bar.jpg']
    >>> image_url('/images/main_logo12.gif')
    ['/images/main_logo12.gif']
    >>> image_url("http://www.image.com/image.jpg")
    ['http://www.image.com/image.jpg']
    >>> image_url("background-image : url('http://www.site.com/path1/path2/image.jpg')")
    ['http://www.site.com/path1/path2/image.jpg']
    >>> image_url('/getimage.php?image=totalgardens/outbbq2_400.jpg&type=prod&resizeto=350')
    ['/getimage.php?image=totalgardens/outbbq2_400.jpg&type=prod&resizeto=350']
    >>> image_url('../image.aspx?thumb=true&amp;boxSize=175&amp;img=Unknoportrait[1].jpg')
    ['../image.aspx?thumb=true&boxSize=175&img=Unknoportrait[1].jpg']
    >>> image_url('http://www.site.com/image.php')
    ['http://www.site.com/image.php']
    """
    found = extract_image_url(txt)
    return [safe_url_string(replace_entities(url(found)))] if found else None
