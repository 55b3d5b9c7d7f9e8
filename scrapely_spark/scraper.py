"""Top-level scraper API: template store, training, extraction.

Parity targets: ``scrapely/__init__.py`` (Scraper) and
``scrapely/template.py`` (TemplateMaker / best_match).  Training happens on
the driver (template volume is tiny); the compiled plan is what Spark
broadcasts.
"""

from __future__ import annotations

import copy
import json

from scrapely_spark.html.entities import str_to_unicode
from scrapely_spark.html.lexer import Tag, TAG_OPEN, TAG_CLOSE, TAG_UNPAIRED
from scrapely_spark.html.page import HtmlPage, page_to_dict
from scrapely_spark.ibl import InstanceBasedLearningExtractor


class AnnotationError(Exception):
    pass


class FragmentNotFound(AnnotationError):
    pass


class FragmentAlreadyAnnotated(AnnotationError):
    pass


def best_match(text):
    """Score function: coverage ratio of ``text`` within a fragment,
    with an earlier-position tie-break."""
    def score(fragment, page):
        data = page.fragment_data(fragment).strip()
        if text in data:
            if not len(data):
                return float("inf")
            return float(len(text)) / len(data) - (1e-6 * fragment.start)
        return 0.0
    return score


class TemplateMaker:
    """Builds an annotated template by scoring fragments of a page."""

    def __init__(self, htmlpage: HtmlPage):
        self.htmlpage = copy.copy(htmlpage)

    def select(self, score_func):
        """Fragment indexes with positive score, best first."""
        page = copy.copy(self.htmlpage)
        scored = []
        for i, fragment in enumerate(page.parsed_body):
            s = score_func(fragment, page)
            if s:
                scored.append((s, i))
        scored.sort(reverse=True)
        return [i for _, i in scored]

    def annotate(self, field, score_func, best_match=True):
        indexes = self.select(score_func)
        if not indexes:
            raise FragmentNotFound(
                "Fragment not found annotating %r using: %s"
                % (field, score_func))
        if best_match:
            del indexes[1:]
        for i in indexes:
            self.annotate_fragment(i, field)

    def annotate_fragment(self, index, field):
        """Splice a data-scrapy-annotate attribute into the enclosing
        open tag (scanning left from the fragment)."""
        for f in self.htmlpage.parsed_body[index::-1]:
            if isinstance(f, Tag) and f.kind == TAG_OPEN:
                if "data-scrapy-annotate" in f.attributes:
                    raise FragmentAlreadyAnnotated(
                        "Fragment already annotated: %s"
                        % self.htmlpage.fragment_data(f))
                payload = {"annotations": {"content": field}}
                attr = ' data-scrapy-annotate="%s"' % json.dumps(
                    payload).replace('"', "&quot;")
                body = self.htmlpage.body
                self.htmlpage.body = body[:f.end - 1] + attr + body[f.end - 1:]
                return True
        return False

    def annotations(self):
        """All (annotation payload, fragment index) pairs in the template."""
        found = []
        for i, f in enumerate(self.htmlpage.parsed_body):
            if isinstance(f, Tag) and f.kind == TAG_OPEN:
                raw = f.attributes.get("data-scrapy-annotate")
                if raw:
                    found.append((json.loads(raw.replace("&quot;", '"')), i))
        return found

    def selected_data(self, index):
        start_tag, end_tag = _enclosing_tags(self.htmlpage, index)
        return self.htmlpage.body[start_tag.start:end_tag.end]

    def get_template(self) -> HtmlPage:
        return self.htmlpage


def _enclosing_tags(htmlpage, index):
    """Balanced (open, close) tag pair enclosing the fragment at ``index``."""
    f = htmlpage.parsed_body[index]
    if isinstance(f, Tag) and f.kind == TAG_UNPAIRED:
        return f, f
    start_tag = None
    for f in htmlpage.parsed_body[index::-1]:
        if isinstance(f, Tag) and f.kind == TAG_OPEN:
            start_tag = f
            break
    if not start_tag:
        raise FragmentNotFound("Unable to find start tag from index %d"
                               % index)
    depth = 1
    end_tag = None
    start_index = htmlpage.parsed_body.index(start_tag)
    for f in htmlpage.parsed_body[start_index + 1:]:
        if isinstance(f, Tag) and f.name == start_tag.name:
            if f.kind == TAG_OPEN:
                depth += 1
            if f.kind == TAG_CLOSE:
                depth -= 1
                if not depth:
                    end_tag = f
                    break
    if not end_tag or htmlpage.parsed_body.index(end_tag) < index:
        return f, f
    return start_tag, end_tag


class Scraper:
    """Train-from-examples scraper over a set of annotated templates."""

    def __init__(self, templates=None):
        self._templates = templates or []
        self._ex = None

    @classmethod
    def fromfile(cls, fp):
        return cls([HtmlPage(**t) for t in json.load(fp)["templates"]])

    def tofile(self, fp):
        json.dump({"templates": [page_to_dict(t) for t in self._templates]},
                  fp)

    def add_template(self, template: HtmlPage):
        self._templates.append(template)
        self._ex = None

    def train(self, url: str, data: dict, encoding=None):
        """Fetch ``url`` and train on it (reference:
        scrapely/__init__.py:46-48).  ``file://`` URLs work offline."""
        from scrapely_spark.html.page import url_to_page
        self.train_from_htmlpage(url_to_page(url, encoding), data)

    def scrape(self, url: str, encoding=None):
        """Fetch ``url`` and scrape it (reference:
        scrapely/__init__.py:50-52)."""
        from scrapely_spark.html.page import url_to_page
        return self.scrape_page(url_to_page(url, encoding))

    def train_from_htmlpage(self, htmlpage: HtmlPage, data: dict):
        if not data:
            raise ValueError("Cannot train with empty data")
        tm = TemplateMaker(htmlpage)
        for field, values in data.items():
            if isinstance(values, (bytes, str)) or not hasattr(values,
                                                               "__iter__"):
                values = [values]
            for value in values:
                value = str_to_unicode(value, htmlpage.encoding)
                tm.annotate(field, best_match(value))
        self.add_template(tm.get_template())

    def scrape_page(self, page: HtmlPage):
        if self._ex is None:
            self._ex = InstanceBasedLearningExtractor(
                (t, None) for t in self._templates)
        return self._ex.extract(page)[0]
