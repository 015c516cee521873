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
    DatabaseManager.java:203).  Found by hypothesis.

    The same ambiguity extends one level up (found by the seeded schema
    fuzz): a $-flattened sub-object whose fields are ALL null has no
    existence marker of its own — its flattened columns are indistinguishable
    from an absent sub-object — so a dict that strips to {} is dropped from
    its parent too (list elements keep their positions; both sides produce
    the same {} there)."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k == KEY or v is None:
                continue
            sv = _strip(v)
            if isinstance(sv, dict) and not sv:
                continue
            out[k] = sv
        return out
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


# ---------------------------------------------------------------------------
# r5: seeded random-SCHEMA fuzz (r4 verdict next-round item 8).  The
# hypothesis test above explores value space over one fixed field menu; this
# sweep generates 50 structurally-random schemas — varying field names,
# nesting depth (ref-in-ref to depth 2), flat sub-objects, typed and untyped
# struct arrays, primitive arrays, field-subset heterogeneity across docs —
# and asserts every one shreds and reassembles losslessly.
# ---------------------------------------------------------------------------

import random

_ADVERSARIAL = ["{child:1}", "{check:[x]}", "[not,json", "", "a$b",
                "null", "__isempty"]


def _rand_primitive(rng: random.Random):
    return rng.choice([
        rng.randint(-10**6, 10**6),
        rng.choice(_ADVERSARIAL),
        "".join(rng.choices("abcdef {}:,", k=rng.randint(0, 12))),
        bool(rng.getrandbits(1)),
        None,
    ])


def _rand_schema(rng: random.Random, counter: list[int], depth: int = 0) -> dict:
    """A schema is a dict: field name → spec.  Names are globally unique per
    schema (child tables are keyed by field name in ShredResult.tables)."""
    def uname(prefix):
        counter[0] += 1
        return f"{prefix}{counter[0]}"

    schema: dict = {uname("p"): "prim" for _ in range(rng.randint(1, 3))}
    if depth < 2 and rng.random() < 0.7:
        for _ in range(rng.randint(1, 2)):
            schema[uname("rc")] = ("ref", _rand_schema(rng, counter, depth + 1))
    if rng.random() < 0.6:
        schema[uname("fs")] = ("flat",
                               [uname("ff") for _ in range(rng.randint(1, 3))])
    if depth < 2 and rng.random() < 0.5:
        schema[uname("arr")] = ("arr_untyped",
                                [uname("af") for _ in range(rng.randint(1, 2))])
    if depth < 2 and rng.random() < 0.4:
        schema[uname("tarr")] = ("arr_typed",
                                 [uname("tv") for _ in range(rng.randint(1, 2))],
                                 [uname("tf")])
    if rng.random() < 0.5:
        schema[uname("pa")] = "prim_array"
    return schema


def _rand_doc(rng: random.Random, schema: dict) -> dict:
    doc: dict = {"rowNum": -1}
    for name, spec in schema.items():
        if rng.random() < 0.25:        # heterogeneity: field absent from doc
            continue
        if spec == "prim":
            doc[name] = _rand_primitive(rng)
        elif spec == "prim_array":
            doc[name] = [rng.randint(0, 99) for _ in range(rng.randint(1, 4))]
        elif spec[0] == "ref":
            doc[name] = _rand_doc(rng, spec[1])
        elif spec[0] == "flat":
            doc[name] = {f: _rand_primitive(rng) for f in spec[1]}
        elif spec[0] == "arr_untyped":
            doc[name] = [
                {"rowNum": -1, **{f: rng.randint(0, 50) for f in spec[1]}}
                for _ in range(rng.randint(1, 3))]
        elif spec[0] == "arr_typed":
            types, fields = spec[1], spec[2]
            doc[name] = [
                {"type": rng.choice(types), "rowNum": -1,
                 **{f: rng.randint(0, 50) for f in fields}}
                for _ in range(rng.randint(1, 3))]
    return doc


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(50))
def test_seeded_random_schema_roundtrip(spark, seed):
    rng = random.Random(seed)
    schema = _rand_schema(rng, counter=[0])
    docs = [_rand_doc(rng, schema) for _ in range(rng.randint(1, 3))]
    ingested = docs_df(spark, docs)
    result = shred(ingested, f"fuzz_root_{seed}")
    out = [json.loads(r["doc"])
           for r in to_documents(assemble(result)).collect()]
    assert len(out) == len(docs)
    got = sorted(json.dumps(_strip(d), sort_keys=True) for d in out)
    want = sorted(json.dumps(_strip(json.loads(s)), sort_keys=True)
                  for s in ingested.toJSON().collect())
    assert got == want, f"seed={seed}"
