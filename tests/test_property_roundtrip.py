"""Property-based round-trip tests (hypothesis): random nested documents
must survive shred → assemble unchanged (modulo engine-assigned keys).

Strategy bounds keep each case small (Spark jobs are the expensive part);
hypothesis explores structure: primitive types, nested ref-objects,
$-flattened sub-objects, typed arrays, primitive arrays, nulls,
adversarial marker strings.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from json_sql_database_storage_spark.documents.fixtures import docs_df
from json_sql_database_storage_spark.documents.model import (
    KEY, assemble, shred, to_documents)

_field_names = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "loginTime", "note", "val"])

_primitive = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(alphabet="abcdefgh {}:[],", min_size=0, max_size=20),
    st.booleans(),
    st.none(),
    st.sampled_from(["{child:1}", "{check:[x]}", "[not,json", ""]),
)


def _doc_strategy() -> st.SearchStrategy[dict]:
    ref_child = st.fixed_dictionaries(
        {"rowNum": st.just(-1), "cval": st.integers(0, 100)})
    flat_child = st.fixed_dictionaries(
        {"fa": st.integers(0, 9), "fb": st.text("xyz", max_size=5)})
    typed_elem = st.fixed_dictionaries(
        {"type": st.sampled_from(["ta", "tb"]), "rowNum": st.just(-1),
         "size": st.integers(0, 50)})
    return st.fixed_dictionaries(
        {"rowNum": st.just(-1)},
        optional={
            "p1": _primitive,
            "p2": _primitive,
            "child": ref_child,
            "sub": flat_child,
            "items": st.lists(typed_elem, min_size=1, max_size=3),
            "tags": st.lists(st.text("abc", min_size=1, max_size=4),
                             min_size=1, max_size=4),
        })


def _strip(obj):
    """Drop engine keys AND null-valued fields: a collection's relational
    schema is the union of observed fields, so a field absent from one doc
    reads back as null — absent ≡ null within a collection (the reference
    has the same property: nulls are skipped on write,
    DatabaseManager.java:203).  Found by hypothesis."""
    if isinstance(obj, dict):
        return {k: _strip(v) for k, v in obj.items()
                if k != KEY and v is not None}
    if isinstance(obj, list):
        return [_strip(x) for x in obj]
    return obj


@pytest.mark.slow
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc_strategy(), min_size=1, max_size=3))
def test_random_docs_roundtrip(spark, docs):
    """shred→assemble must be lossless relative to the INGESTED documents.

    The expectation is computed from the ingested DataFrame, not the raw
    dicts, because `spark.read.json` schema inference is itself lossy in
    one corner hypothesis found: an empty string merged with a numeric
    field infers the numeric type and parses "" to null ({"p1": 0} +
    {"p1": ""} → LongType, null).  That is ingest semantics upstream of
    the document model; the property owned by shred/assemble starts at
    the ingested representation."""
    ingested = docs_df(spark, docs)
    result = shred(ingested, "prop_root")
    out = [json.loads(r["doc"])
           for r in to_documents(assemble(result)).collect()]
    assert len(out) == len(docs)
    got = sorted(json.dumps(_strip(d), sort_keys=True) for d in out)
    want = sorted(json.dumps(_strip(json.loads(s)), sort_keys=True)
                  for s in ingested.toJSON().collect())
    assert got == want
