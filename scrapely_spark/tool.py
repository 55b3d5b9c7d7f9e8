"""Command-line template-store tool.

Full parity with the reference's ``scrapely/tool.py`` (IblTool) in both
of its modes:

* **Interactive REPL** — ``python -m scrapely_spark.tool STORE.json``
  with no command starts a ``cmd.Cmd`` shell (the reference's
  ``scrapely>`` loop, tool.py:10-111): ``add_template``/``ta``,
  ``ls_templates``/``ls``/``tl``, ``del_template``/``td``,
  ``annotate``/``a``/``t`` (with ``-f FIELD`` / ``-n NUMBER`` criteria,
  test mode when ``-f`` is omitted), ``ls_annotations``/``al``,
  ``scrape``/``s``, EOF/Ctrl-D to exit.  The template store is reloaded
  from disk on every command and saved after each mutation, exactly as
  the reference's ``_load_templates``/``_save_templates`` do.

* **One-shot argparse CLI** over the same JSON template store:

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
import cmd
import json
import os
import pprint
import re
import shlex
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


def _parse_criteria(line: str):
    """``<text> [-f FIELD] [-n NUMBER]`` → (text, field, number).

    The reference parses annotate criteria with optparse over
    ``shlex.split`` (tool.py:150-160); this is the same grammar.
    """
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("-f", "--field", default=None)
    p.add_argument("-n", "--number", type=int, default=None)
    ns, rest = p.parse_known_args(shlex.split(line))
    return " ".join(rest), ns.field, ns.number


def _apply_criteria(tm: TemplateMaker, text: str, number):
    """Reference apply_criteria (tool.py:169-177): best_match selection,
    optionally narrowed to the number-th hit."""
    sel = tm.select(best_match(text)) if text else []
    if number is not None:
        sel = [sel[number]] if number < len(sel) else []
    return sel


class IblShell(cmd.Cmd):
    """Interactive template-store shell — the reference IblTool REPL.

    Every command reloads the store from disk and mutations save it
    back immediately (reference ``_load_templates``/``_save_templates``,
    tool.py:126-146), so concurrent one-shot invocations and the shell
    always agree.
    """

    prompt = "scrapely> "

    def __init__(self, filename: str, **kw):
        self.filename = filename
        cmd.Cmd.__init__(self, **kw)

    # -- helpers ----------------------------------------------------------

    def fix_url(self, url: str) -> str:
        if not url.startswith("http") and not os.path.exists(url) \
                and not url.startswith("file://"):
            url = "http://" + url
        return url

    def _scraper(self) -> Scraper:
        return _load_scraper(self.filename)

    def _save(self, sc: Scraper):
        _save_scraper(sc, self.filename)

    def _template(self, sc: Scraper, template_id: str):
        try:
            return sc._templates[int(template_id)]
        except (IndexError, ValueError):
            print("Could not load template: %s" % template_id,
                  file=self.stdout)

    # -- commands ---------------------------------------------------------

    def do_add_template(self, line):
        """add_template <url> [--encoding ENCODING] - (alias: ta)"""
        if not line:
            print("You must provide an URL", file=self.stdout)
            print(IblShell.do_add_template.__doc__, file=self.stdout)
            return
        p = argparse.ArgumentParser(add_help=False)
        p.add_argument("-e", "--encoding", default="utf-8")
        ns, rest = p.parse_known_args(shlex.split(line))
        page = _load_page(self.fix_url(rest[0]), ns.encoding)
        sc = self._scraper()
        sc._templates.append(page)
        self._save(sc)
        print("[%d] %s" % (len(sc._templates) - 1, page.url),
              file=self.stdout)
    do_ta = do_add_template

    def do_ls_templates(self, line):
        """ls_templates - list templates (aliases: ls, tl)"""
        for n, t in enumerate(self._scraper()._templates):
            print("[%d] %s" % (n, t.url), file=self.stdout)
    do_ls, do_tl = do_ls_templates, do_ls_templates

    def do_del_template(self, template_id):
        """del_template <template_id> - delete template (alias: td)"""
        sc = self._scraper()
        try:
            del sc._templates[int(template_id)]
            self._save(sc)
            print("template deleted: %s" % template_id, file=self.stdout)
        except IndexError:
            print("template not found: %s" % template_id,
                  file=self.stdout)
    do_td = do_del_template

    def do_annotate(self, line):
        """annotate <template_id> <data> [-n number] [-f field] - add or test annotation (aliases: a, t)

        Add a new annotation (if -f is passed) or test what would be
        annotated otherwise
        """
        if line.find(" ") < 0:
            print("You must provide a valid template identifier "
                  "(check output of ls_templates)", file=self.stdout)
            print(IblShell.do_annotate.__doc__, file=self.stdout)
            return
        template_id, criteria = line.split(" ", 1)
        sc = self._scraper()
        t = self._template(sc, template_id)
        if not t:
            return
        text, field, number = _parse_criteria(criteria)
        tm = TemplateMaker(t)
        selection = _apply_criteria(tm, text, number)
        if field:
            for index in selection:
                index = selection[0]
                tm.annotate_fragment(index, field)
                sc._templates[int(template_id)] = tm.get_template()
                sc._ex = None
                self._save(sc)
                print("[new] (%s) %r"
                      % (field,
                         _remove_annotation(tm.selected_data(index))),
                      file=self.stdout)
        else:
            for n, i in enumerate(selection):
                print("[%d] %r"
                      % (n, _remove_annotation(tm.selected_data(i))),
                      file=self.stdout)
    do_a, do_t = do_annotate, do_annotate

    def do_ls_annotations(self, template_id):
        """ls_annotations <template> - list annotations (alias: al)"""
        if not template_id:
            sys.stderr.write("missing template id" + os.linesep)
            return
        sc = self._scraper()
        t = self._template(sc, template_id)
        if not t:
            return
        tm = TemplateMaker(t)
        for n, (payload, i) in enumerate(tm.annotations()):
            print("[%s-%d] (%s) %r"
                  % (template_id, n, payload["annotations"]["content"],
                     _remove_annotation(tm.selected_data(i))),
                  file=self.stdout)
    do_al = do_ls_annotations

    def do_scrape(self, url):
        """scrape <url> - scrape url (alias: s)"""
        sc = self._scraper()
        if not sc._templates:
            sys.stderr.write("no templates available" + os.linesep)
            return
        encoding = getattr(sc._templates[0], "encoding", "utf-8") or "utf-8"
        page = _load_page(self.fix_url(url.strip()), encoding)
        pprint.pprint(sc.scrape_page(page), stream=self.stdout)
    do_s = do_scrape

    def default(self, line):
        if line == "EOF":
            if self.use_rawinput:
                print("", file=self.stdout)
            return True
        elif line:
            return cmd.Cmd.default(self, line)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) == 1 and not argv[0].startswith("-"):
        # no command → the interactive shell (reference main, tool.py:199-211)
        IblShell(argv[0]).cmdloop()
        return 0
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
