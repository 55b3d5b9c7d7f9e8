from scrapely_spark.html.lexer import (
    Frag,
    Tag,
    TAG_OPEN,
    TAG_CLOSE,
    TAG_UNPAIRED,
    lex,
)
from scrapely_spark.html.page import HtmlPage, page_to_dict, dict_to_page

__all__ = [
    "Frag",
    "Tag",
    "TAG_OPEN",
    "TAG_CLOSE",
    "TAG_UNPAIRED",
    "lex",
    "HtmlPage",
    "page_to_dict",
    "dict_to_page",
]
