"""Output-side schema: field and item descriptors.

Parity target: ``scrapely/descriptor.py``.  A field descriptor names a
field, attaches its refinement/validation extractor (default: the ``text``
scalar) and a required flag; an item descriptor validates whole records
(every required field present directly or in any variant).
"""

from __future__ import annotations

from itertools import chain

from scrapely_spark.functions.scalars import text


class FieldDescriptor:
    __slots__ = ("name", "description", "extractor", "required")

    def __init__(self, name, description, extractor=text, required=False):
        self.name = name
        self.description = description
        self.extractor = extractor
        self.required = required

    def __repr__(self):
        return "FieldDescriptor(%s)" % self.name


class ItemDescriptor:
    def __init__(self, name, description, attribute_descriptors):
        self.name = name
        self.description = description
        self.attribute_map = {d.name: d for d in attribute_descriptors}
        self._required_attributes = [
            d.name for d in attribute_descriptors if d.required]

    def validated(self, data):
        """Keep only records with every required field present."""
        return [d for d in data if self._record_ok(d)]

    def _record_ok(self, record) -> bool:
        variant_fields = set(chain(
            *[v.keys() for v in record.get("variants", [])]))
        return bool(record) and all(
            name in record or name in variant_fields
            for name in self._required_attributes)

    def get_required_attributes(self):
        return self._required_attributes

    def copy(self) -> "ItemDescriptor":
        return ItemDescriptor(self.name, self.description, [
            FieldDescriptor(d.name, d.description, d.extractor, d.required)
            for d in self.attribute_map.values()
        ])

    def __repr__(self):
        return "ItemDescriptor(%s)" % self.name
