"""Entity decoding, comment stripping, URL escaping, encoding detection.

Self-contained replacements for the small slice of w3lib the reference
depends on (``w3lib.html.replace_entities``, ``w3lib.html.remove_comments``,
``w3lib.url.safe_url_string``, ``w3lib.encoding.html_to_unicode``,
``w3lib.util.str_to_unicode``).  Behavior is pinned by the reference's own
doctest corpus (e.g. ``scrapely/extractors.py:77-106``), which our parity
tests execute against these implementations.
"""

from __future__ import annotations

import codecs
import re
from html.entities import name2codepoint
from urllib.parse import quote

_ENTITY_RE = re.compile(
    r"&((?P<named>[a-z\d]{1,10})|#(?P<dec>\d{1,7})|#x(?P<hex>[a-f\d]{1,6}))(?P<semi>;?)",
    re.IGNORECASE,
)


def str_to_unicode(value, encoding: str = "utf-8") -> str:
    if encoding is None:
        encoding = "utf-8"
    if isinstance(value, bytes):
        return value.decode(encoding)
    return value


def _codepoint_to_char(number: int):
    # Numeric references in 0x80-0x9f are conventionally interpreted as
    # the characters mapped to those bytes in windows-1252.
    try:
        if 0x80 <= number <= 0x9F:
            return bytes((number,)).decode("cp1252")
        return chr(number)
    except (ValueError, UnicodeDecodeError):
        return None


def replace_entities(text, keep=(), remove_illegal: bool = True,
                     encoding: str = "utf-8") -> str:
    """Decode named and numeric HTML entities in ``text``.

    Unknown entities are removed when ``remove_illegal`` (matching the
    w3lib contract the reference relies on); entity names listed in
    ``keep`` are passed through untouched.
    """

    def _sub(m):
        g = m.groupdict()
        number = None
        if g["dec"]:
            number = int(g["dec"], 10)
        elif g["hex"]:
            number = int(g["hex"], 16)
        elif g["named"]:
            name = g["named"]
            if name in keep or name.lower() in keep:
                return m.group(0)
            number = name2codepoint.get(name) or name2codepoint.get(name.lower())
        if number is not None:
            decoded = _codepoint_to_char(number)
            if decoded is not None:
                return decoded
        return "" if remove_illegal and g.get("semi") else m.group(0)

    return _ENTITY_RE.sub(_sub, str_to_unicode(text, encoding))


_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.DOTALL)


def remove_comments(text, encoding: str = "utf-8") -> str:
    """Strip ``<!-- ... -->`` comments (unterminated comments eat the tail)."""
    return _COMMENT_RE.sub("", str_to_unicode(text, encoding))


# RFC-3986 reserved + unreserved + '%' — what w3lib treats as already-safe.
_URL_SAFE = "%/:=&?~#+!$,;'@()*[]|"


def safe_url_string(url, encoding: str = "utf-8") -> str:
    """Percent-escape unsafe characters, leaving existing escapes alone."""
    text = str_to_unicode(url, encoding).strip()
    return quote(text.encode(encoding), safe=_URL_SAFE)


_BOM_TABLE = [
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
]
_CHARSET_IN_HEADER_RE = re.compile(r"charset=([\w-]+)", re.I)
_CHARSET_IN_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([\w-]+)""", re.I
)


def _norm_encoding(name):
    if not name:
        return None
    try:
        return codecs.lookup(name.strip()).name
    except (LookupError, TypeError):
        return None


def html_to_unicode(content_type_header, body_bytes: bytes,
                    default_encoding: str = "utf-8"):
    """Best-effort encoding detection: header charset → BOM → meta → default.

    Returns ``(encoding, unicode_body)``.  Only used on the replay/fetch
    path (``url_to_page`` equivalent); the extraction kernels always see
    unicode bodies.
    """
    enc = None
    if content_type_header:
        m = _CHARSET_IN_HEADER_RE.search(content_type_header)
        if m:
            enc = _norm_encoding(m.group(1))
    if enc is None:
        for bom, bom_enc in _BOM_TABLE:
            if body_bytes.startswith(bom):
                enc = bom_enc
                body_bytes = body_bytes[len(bom):]
                break
    if enc is None:
        m = _CHARSET_IN_META_RE.search(body_bytes[:4096])
        if m:
            enc = _norm_encoding(m.group(1).decode("ascii", "replace"))
    if enc is None:
        enc = _norm_encoding(default_encoding) or "utf-8"
    return enc, body_bytes.decode(enc, errors="replace")
