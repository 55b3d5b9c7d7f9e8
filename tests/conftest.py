"""Test harness wiring.

Adds the shim dir (w3lib/parameterized stand-ins) and the read-only
reference checkout to sys.path so parity tests can import the reference
library and run it as a live oracle next to scrapely_spark.  Nothing from
the reference is copied into this repo; its fixtures are read at test time.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "tests", "shims")
REFERENCE = os.environ.get("SCRAPELY_REFERENCE", "/root/reference")

for p in (REPO, SHIMS, REFERENCE):
    if p not in sys.path:
        sys.path.insert(0, p)


def load_reference_module(relpath: str, name: str):
    """Import a module file from the reference checkout under a safe alias."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_extraction_corpus():
    """The reference's 40-case golden extraction corpus (TEST_DATA)."""
    mod = load_reference_module("tests/test_extraction.py",
                                "ref_test_extraction")
    return mod


@pytest.fixture(scope="session")
def spark():
    from scrapely_spark.spark.session import get_spark
    # local[8]: python-worker startup dominates small test jobs; 8 workers
    # is plenty for correctness runs (bench.py owns the scaling runs)
    s = get_spark(app_name="scrapely-spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()
