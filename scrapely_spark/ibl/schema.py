"""Output-side schema: field and item descriptors.

Parity target: ``scrapely/descriptor.py`` — this is a 4-slot API
contract (name / description / extractor / required) plus the
required-field record validation rule, so the public surface must match
the reference name-for-name; everything inside is free and original.

A field descriptor names a field, attaches its refinement/validation
extractor (default: the ``text`` scalar) and a required flag; an item
descriptor validates whole records (every required field present at the
top level or inside any variant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from scrapely_spark.functions.scalars import text


@dataclass(eq=False, repr=False, slots=True)
class FieldDescriptor:
    name: str
    description: str
    extractor: Callable[[str], Any] = text
    required: bool = False

    def __repr__(self) -> str:
        return "FieldDescriptor(%s)" % self.name


class ItemDescriptor:
    def __init__(self, name, description, attribute_descriptors):
        self.name = name
        self.description = description
        self.attribute_map = {}
        required = []
        for descriptor in attribute_descriptors:
            self.attribute_map[descriptor.name] = descriptor
            if descriptor.required:
                required.append(descriptor.name)
        self._required_attributes = required

    def get_required_attributes(self):
        return self._required_attributes

    def copy(self) -> "ItemDescriptor":
        clones = [FieldDescriptor(d.name, d.description, d.extractor,
                                  d.required)
                  for d in self.attribute_map.values()]
        return ItemDescriptor(self.name, self.description, clones)

    def validated(self, data):
        """Drop records missing any required field.

        A field counts as present when it appears at the record's top
        level or inside any of its ``variants``; empty records never
        validate.
        """
        required = self._required_attributes
        if not required:
            return [record for record in data if record]
        keep = []
        for record in data:
            if not record:
                continue
            in_variants: set = set()
            for variant in record.get("variants", []):
                in_variants.update(variant)
            if all(f in record or f in in_variants for f in required):
                keep.append(record)
        return keep

    def __repr__(self) -> str:
        return "ItemDescriptor(%s)" % self.name
