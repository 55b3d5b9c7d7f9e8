"""Minimal w3lib-compatible shim (TEST-ONLY).

Lets the read-only reference library import inside this sandbox (w3lib is
not installed) so parity tests can run the reference side-by-side as a
live oracle. Delegates to scrapely_spark's own implementations; the
reference's hardcoded golden expectations therefore also validate those
implementations.
"""
