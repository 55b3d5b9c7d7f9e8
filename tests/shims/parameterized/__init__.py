"""Tiny parameterized.expand stand-in (TEST-ONLY) so the reference's test
modules import; we read their TEST_DATA, we don't run their TestCases."""


class parameterized:  # noqa: N801 — mimics the pypi package's API
    @staticmethod
    def expand(data):
        def deco(fn):
            return fn
        return deco


def param(*args, **kwargs):
    return args, kwargs
