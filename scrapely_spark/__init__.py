"""scrapely_spark — a from-scratch PySpark-native crawl + template-extraction engine.

Re-expresses the capabilities of the reference library (scrapely, read-only at
/root/reference) Spark-first:

* ``scrapely_spark.html``       — HTML lexing, entities, page containers
  (parity target: scrapely/htmlpage.py).
* ``scrapely_spark.ibl``        — instance-based-learning extraction kernels
  (parity target: scrapely/extraction/*).
* ``scrapely_spark.functions``  — scalar refinement functions
  (parity target: scrapely/extractors.py).
* ``scrapely_spark.spark``      — DataFrame operators: the vectorized
  extraction stage, dedup, similarity search, text analysis, synthetic data.
* ``scrapely_spark.frontier``   — the crawl half (no reference equivalent,
  designed from first principles per SURVEY.md §7.4): URL canonicalization,
  blocked-bloom URL-seen state, robots gating, politeness scheduling,
  deterministic resumable rounds.

Nothing here is a line port: kernels are numpy-vectorized and run inside
Arrow-batched pandas UDFs; orchestration is DataFrame/Catalyst.
"""

from scrapely_spark.scraper import Scraper
from scrapely_spark.html.page import HtmlPage, page_to_dict, dict_to_page
from scrapely_spark.ibl import InstanceBasedLearningExtractor

__version__ = "0.1.0"

__all__ = [
    "Scraper",
    "HtmlPage",
    "page_to_dict",
    "dict_to_page",
    "InstanceBasedLearningExtractor",
    "__version__",
]
