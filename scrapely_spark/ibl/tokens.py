"""Token vocabulary for IBL matching.

The reference keys tokens by insertion order in a shared ``TokenDict``
(``scrapely/extraction/pageobjects.py:18-69``).  Insertion-order ids are
nondeterministic under parallelism, but the IBL algorithm only ever tests
*equality* between template tokens and page tokens (never page-vs-page),
so any injective mapping works.  Our Spark design therefore:

* builds the vocabulary from the *templates only*, on the driver;
* broadcasts the frozen vocabulary with the compiled extraction plans;
* maps page tokens missing from the vocabulary to a single ``UNKNOWN``
  sentinel (-1), which can never equal a template token id — exactly the
  behavior fresh insertion-order ids would produce, with a bounded
  broadcast size.

Id packing mirrors the reference layout (low 24 bits ordinal, type in the
high bits) purely for debuggability.
"""

from __future__ import annotations

UNKNOWN = -1


class Vocab:
    """String+type → int64 token id; optionally frozen for page-side use."""

    __slots__ = ("ids", "frozen")

    def __init__(self, ids=None, frozen: bool = False):
        self.ids = dict(ids or {})
        self.frozen = frozen

    def token_id(self, name: str, kind: int) -> int:
        base = self.ids.get(name)
        if base is None:
            if self.frozen:
                return UNKNOWN
            base = len(self.ids)
            self.ids[name] = base
        return base | (kind << 24)

    def freeze(self) -> "Vocab":
        """Immutable copy for broadcast to executors."""
        return Vocab(self.ids, frozen=True)

    @staticmethod
    def kind_of(token_id: int) -> int:
        return token_id >> 24

    def name_of(self, token_id: int) -> str:
        """Reverse lookup (debugging only, O(N))."""
        base = token_id & 0xFFFFFF
        for name, i in self.ids.items():
            if i == base:
                return name
        raise KeyError(token_id)
