"""JSON document fixtures F1-F8 (FIXTURES.md §2) — one per structural rule of
the reference (rule citations in FIXTURES.md)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

F1_FLAT = {
    "rowNum": -1, "name": "alice",
    "age": 31,
    "bio": "b" * 140,
    "loginTime": "2024-01-01T10:30:00",
    "numeric_string": "007",
    "active": True,
}

F2_NESTED_REF = {
    "rowNum": -1, "type_hint": "order", "total": 42,
    "customer": {"rowNum": -1, "name": "bob", "tier": 2},
}

F3_FLATTEN = {
    "rowNum": -1, "name": "pizza",
    "topping": {"name": "olive", "extra_cost": 2},
}

F4_TYPED_ARRAY = {
    "rowNum": -1, "name": "combo",
    "items": [
        {"type": "drink", "rowNum": -1, "size": 2},
        {"type": "side", "rowNum": -1, "size": 1},
        {"type": "drink", "rowNum": -1, "size": 3},
    ],
}

F5_PRIMITIVE_ARRAYS = {
    "rowNum": -1, "name": "tags_holder",
    "tags": ["a", "b", "c"],
    "scores": [1, 2, 3],
}

F6_NULL_ADVERSARIAL = {
    "rowNum": -1, "note": None,
    "tricky1": "{child:999}",
    "tricky2": "{check:[x]}",
    "tricky3": "[not,json",
}

F7_UPDATE = {"rowNum": 1, "name": "alice-renamed", "age": 32}

F8_EXTENDED = {
    "rowNum": -1,
    "matrix": [[1, 2], [3, 4]],
    "untyped_arr": [{"no_type_field": 1}],
    "deep": {"a": {"rowNum": -1, "b": {"rowNum": -1, "c": 1}}},
}

# one doc with a populated object-array, one with the SAME field empty:
# `[]` must survive shred→assemble (empty-array marker), while the sibling
# forces the field's schema to array<struct> so the empty list is ambiguous
# without it
F9_EMPTY_ARRAY = [
    {"rowNum": -1, "name": "full", "entries": [{"rowNum": -1, "v": 1}]},
    {"rowNum": -1, "name": "hollow", "entries": []},
]

ALL_FIXTURES = {
    "f1": [F1_FLAT],
    "f2": [F2_NESTED_REF],
    "f3": [F3_FLATTEN],
    "f4": [F4_TYPED_ARRAY],
    "f5": [F5_PRIMITIVE_ARRAYS],
    "f6": [F6_NULL_ADVERSARIAL],
    "f7": [F7_UPDATE],
    "f8": [F8_EXTENDED],
    "f9": F9_EMPTY_ARRAY,
}


def docs_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    """JSON-string ingest with schema inference — reference A1 entry shape
    (a JsonObject per document)."""
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(d) for d in docs]))
