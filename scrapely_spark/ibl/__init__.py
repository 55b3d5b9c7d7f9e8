"""Instance-based-learning extraction: plan building + multi-template trial.

Parity target: ``scrapely/extraction/__init__.py``.  The rewrite pipeline
(Repeat → Variant → Repeat → Variant → Repeat → Record) and the
first-validated-template-wins trial order (templates sorted by annotation
count, descending) are preserved exactly.

Spark shape: :func:`build_plans` runs once on the driver and returns a
picklable :class:`ExtractionPlan` that is broadcast; executors call
:meth:`ExtractionPlan.extract_page` per page inside the Arrow batch kernel.
"""

from __future__ import annotations

from scrapely_spark.html.page import HtmlPage
from scrapely_spark.ibl.extractors import (
    RecordExtractor,
    RepeatExtractor,
    SlotExtractor,
    TemplateExtractor,
    VariantRecordExtractor,
)
from scrapely_spark.ibl.parsing import compile_template, tokenize_page
from scrapely_spark.ibl.tokens import Vocab

# fixed rule order, as in the reference (extraction/__init__.py:30-37)
_REWRITE_PIPELINE = [
    RepeatExtractor,
    VariantRecordExtractor,
    RepeatExtractor,
    VariantRecordExtractor,
    RepeatExtractor,
    RecordExtractor,
]


def _keep_not_none(items):
    return [d for d in items if d is not None]


def build_tree(template, descriptor) -> TemplateExtractor:
    """Compiled template → extractor tree via the fixed rewrite pipeline."""
    attr_map = descriptor.attribute_map if descriptor else None
    extractors = SlotExtractor.build(template.slots, attr_map)
    for rule in _REWRITE_PIPELINE:
        extractors = rule.apply(template, extractors)
    return TemplateExtractor(template, extractors)


class ExtractionPlan:
    """Broadcastable, picklable compiled state for the extraction stage."""

    def __init__(self, template_descriptor_pairs, apply_extrarequired=True,
                 trace=False):
        self.trace = trace
        vocab = Vocab()
        compiled = []
        for template_page, descriptor in template_descriptor_pairs:
            parsed = compile_template(template_page, vocab)
            if not parsed.slots:
                continue  # annotation-less templates extract nothing
            if descriptor is not None and apply_extrarequired:
                descriptor = descriptor.copy()
                for attr in parsed.required:
                    descriptor._required_attributes.append(attr)
                    if attr in descriptor.attribute_map:
                        descriptor.attribute_map[attr].required = True
            compiled.append((parsed, descriptor))

        # templates with more annotations take precedence
        compiled.sort(key=lambda pair: len(pair[0].slots), reverse=True)

        self.vocab = vocab.freeze()
        self.trees = [build_tree(t, d) for t, d in compiled]
        self.validators = {
            t.id: (d.validated if d else _keep_not_none) for t, d in compiled}

    def extract_page(self, page: HtmlPage, pref_template_id=None):
        """Try trees in precedence order; first validated non-empty wins.

        With ``trace=True`` every returned record carries a ``trace``
        key listing per-slot execution events (role parity with the
        reference's TraceExtractor debug strings; not a byte-parity
        surface).
        """
        tokenized = tokenize_page(page, self.vocab)
        trees = self.trees
        if pref_template_id is not None:
            trees = sorted(trees,
                           key=lambda t: t.template.id != pref_template_id)
        # getattr: a broadcast plan may have been pickled by an older
        # driver than the worker code unpickling it (rolling upgrade)
        want_trace = getattr(self, "trace", False)
        for tree in trees:
            events = [] if want_trace else None
            kw = {"trace": events} if want_trace else {}
            records = tree.extract(tokenized, **kw)
            valid = self.validators[tree.template.id](records)
            if len(valid) > 0:
                if events is not None:
                    for record in valid:
                        if isinstance(record, dict):
                            record["trace"] = list(events)
                return valid, tree.template
        return None, None


class InstanceBasedLearningExtractor:
    """Drop-in equivalent of the reference extractor class."""

    def __init__(self, td_pairs, trace=False, apply_extrarequired=True):
        self.plan = ExtractionPlan(list(td_pairs), apply_extrarequired,
                                   trace=trace)
        self.extraction_trees = self.plan.trees

    def extract(self, html_page: HtmlPage, pref_template_id=None):
        return self.plan.extract_page(html_page, pref_template_id)


__all__ = [
    "ExtractionPlan",
    "InstanceBasedLearningExtractor",
    "build_tree",
]
