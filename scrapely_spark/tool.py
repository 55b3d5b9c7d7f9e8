"""Command-line template-store tool.

Role parity with the reference's interactive ``scrapely/tool.py`` (IblTool)
as a plain argparse CLI over the JSON template store:

    python -m scrapely_spark.tool STORE.json ta <url-or-file> key=value ...
    python -m scrapely_spark.tool STORE.json tl
    python -m scrapely_spark.tool STORE.json td <index>
    python -m scrapely_spark.tool STORE.json a  <index> <text> [--field F]
                                                [--number N]
    python -m scrapely_spark.tool STORE.json al <index>
    python -m scrapely_spark.tool STORE.json s  <url-or-file>

``a`` without ``--field`` tests what a criteria would annotate (prints
the matching fragments); with ``--field`` it adds the annotation to the
stored template — mirroring the reference IblTool's do_annotate
(scrapely/tool.py:55-82).  ``al`` lists a template's annotations
(scrapely/tool.py:84-93).

URLs fetch via ``url_to_page`` when the environment allows networking;
``file://`` paths and plain local paths are read directly (the only mode
exercised in this offline sandbox).
"""

from __future__ import annotations

import argparse
import json
import os
import pprint
import re
import sys

from scrapely_spark.html.page import HtmlPage
from scrapely_spark.scraper import Scraper, TemplateMaker, best_match


def _remove_annotation(text: str) -> str:
    return re.sub(u' ?data-scrapy-annotate=".*?"', "", text)


def _load_page(source: str, encoding: str = "utf-8") -> HtmlPage:
    if source.startswith(("http://", "https://")):
        from scrapely_spark.html.page import url_to_page
        return url_to_page(source)
    path = source[len("file://"):] if source.startswith("file://") else source
    with open(path, "rb") as fh:
        return HtmlPage(url="file://%s" % os.path.abspath(path),
                        body=fh.read().decode(encoding), encoding=encoding)


def _load_scraper(store: str) -> Scraper:
    if os.path.exists(store):
        with open(store) as fh:
            return Scraper.fromfile(fh)
    return Scraper()


def _save_scraper(sc: Scraper, store: str):
    with open(store, "w") as fh:
        sc.tofile(fh)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="scrapely_spark.tool", description=__doc__)
    parser.add_argument("store", help="JSON template store path")
    parser.add_argument("command",
                        choices=["ta", "tl", "td", "a", "al", "s"],
                        help="ta=train+add, tl=list, td=delete, "
                             "a=annotate/test, al=list annotations, "
                             "s=scrape")
    parser.add_argument("args", nargs="*")
    parser.add_argument("--encoding", default="utf-8")
    parser.add_argument("--field", "-f", default=None,
                        help="a: field to annotate (omit to test only)")
    parser.add_argument("--number", "-n", type=int, default=None,
                        help="a: pick the N-th matching fragment")
    ns = parser.parse_args(argv)

    sc = _load_scraper(ns.store)

    if ns.command == "ta":
        if not ns.args:
            parser.error("ta needs <url-or-file> [field=value ...]")
        page = _load_page(ns.args[0], ns.encoding)
        data = dict(kv.split("=", 1) for kv in ns.args[1:])
        if not data:
            parser.error("ta needs at least one field=value to annotate")
        sc.train_from_htmlpage(page, data)
        _save_scraper(sc, ns.store)
        print("[%d] template added" % (len(sc._templates) - 1))
    elif ns.command == "tl":
        for i, t in enumerate(sc._templates):
            print("[%d] %s (%d chars)" % (i, t.url, len(t.body)))
    elif ns.command == "td":
        if not ns.args or not ns.args[0].lstrip("-").isdigit():
            parser.error("td needs a template index (see tl)")
        index = int(ns.args[0])
        if not 0 <= index < len(sc._templates):
            parser.error("no template at index %d (store has %d)"
                         % (index, len(sc._templates)))
        del sc._templates[index]
        sc._ex = None
        _save_scraper(sc, ns.store)
        print("template deleted: %d" % index)
    elif ns.command == "a":
        if len(ns.args) < 2:
            parser.error("a needs <template-index> <text> "
                         "[--field F] [--number N]")
        index = int(ns.args[0])
        if not 0 <= index < len(sc._templates):
            parser.error("no template at index %d (store has %d)"
                         % (index, len(sc._templates)))
        text = " ".join(ns.args[1:])
        tm = TemplateMaker(sc._templates[index])
        selection = tm.select(best_match(text))
        if ns.number is not None:
            selection = ([selection[ns.number]]
                         if ns.number < len(selection) else [])
        if ns.field:
            if not selection:
                parser.error("no fragment matches %r" % text)
            tm.annotate_fragment(selection[0], ns.field)
            sc._templates[index] = tm.get_template()
            sc._ex = None
            _save_scraper(sc, ns.store)
            print("[new] (%s) %r" % (
                ns.field, _remove_annotation(tm.selected_data(
                    selection[0]))))
        else:
            for n, i in enumerate(selection):
                print("[%d] %r" % (
                    n, _remove_annotation(tm.selected_data(i))))
    elif ns.command == "al":
        if not ns.args or not ns.args[0].lstrip("-").isdigit():
            parser.error("al needs a template index (see tl)")
        index = int(ns.args[0])
        if not 0 <= index < len(sc._templates):
            parser.error("no template at index %d (store has %d)"
                         % (index, len(sc._templates)))
        tm = TemplateMaker(sc._templates[index])
        for n, (payload, i) in enumerate(tm.annotations()):
            print("[%d-%d] (%s) %r" % (
                index, n, payload["annotations"]["content"],
                _remove_annotation(tm.selected_data(i))))
    elif ns.command == "s":
        if not ns.args:
            parser.error("s needs <url-or-file> to scrape")
        page = _load_page(ns.args[0], ns.encoding)
        records = sc.scrape_page(page)
        pprint.pprint(records)
    return 0


if __name__ == "__main__":
    sys.exit(main())
