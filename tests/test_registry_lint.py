"""Registry-level output-type lint (VERDICT.md round 1, "What's wrong").

The driver's value hasher is stricter than the local canonicalizer in two
ways observed in CORRECTNESS_r01:

1. DuckDB types an uncast integer ``sum()`` as HUGEINT (INT128) and the
   driver's hash then disagrees with Spark's BIGINT even when the values are
   identical (scan_in_memory, scan_json_ingest_inference both hash-failed).
2. Array/struct-typed OUTPUT columns crash the hasher outright
   (``TypeError: unhashable type: 'list'`` — agg_collect,
   join_renest_documents both ERR'd).

So every registered query must produce only driver-hashable scalar columns,
on BOTH engines.  This lint runs each oracle through DuckDB ``DESCRIBE``
(types only, no execution) and each Spark query's analyzed schema, and
fails the build on any hazardous column type before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from json_sql_database_storage_spark import registry

registry.load_all()
_SPECS = registry.specs()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ALL = sorted(_SPECS)

# DuckDB types that hash identically to the Spark output through the
# driver's pandas bridge.  HUGEINT / DECIMAL / DATE / LIST / STRUCT / MAP
# are all observed or expected hazards.  Exact match (not prefix) so that
# "BIGINT[]" — a list — is correctly rejected.
_DUCK_OK_TYPES = frozenset({
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S",
})
# BOOLEAN is deliberately absent: the driver's hasher is proven on
# int/double/string/timestamp (CORRECTNESS_r01 green rows) but no green row
# has ever carried a boolean — registered outputs use BIGINT 0/1 instead.

_SPARK_OK_TYPES = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.StringType,
    T.TimestampType, T.TimestampNTZType,
)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_output_types_hashable(duck, name):
    cols = duck.execute(f"DESCRIBE {_SPECS[name].oracle}").fetchall()
    bad = [(c[0], c[1]) for c in cols
           if str(c[1]).upper() not in _DUCK_OK_TYPES]
    assert not bad, (
        f"{name}: oracle output columns with driver-hasher-hazard DuckDB "
        f"types {bad}; cast sums to BIGINT/DOUBLE and render arrays/structs "
        f"with to_json")


@pytest.mark.parametrize("name", _ALL)
def test_spark_output_types_hashable(spark, sf_dir, name):
    schema = _SPECS[name].fn(spark, sf_dir).schema
    bad = [(f.name, f.dataType.simpleString()) for f in schema.fields
           if not isinstance(f.dataType, _SPARK_OK_TYPES)]
    assert not bad, (
        f"{name}: Spark output columns with driver-hasher-hazard types "
        f"{bad}; render arrays/maps/structs with to_json and decimals/dates "
        f"as double/timestamp")


# Cross-engine KIND parity: integer widths canonicalize identically through
# the driver's hash (window_ranking was green in r01 with BIGINT-vs-int), but
# int-vs-float (e.g. DuckDB sign() TINYINT vs Spark signum() DOUBLE) renders
# "1" vs "1.0" under type-sensitive hashing — catch the class statically.
_DUCK_KIND = {
    "BIGINT": "i", "INTEGER": "i", "SMALLINT": "i", "TINYINT": "i",
    "UBIGINT": "i", "UINTEGER": "i",
    "DOUBLE": "f", "FLOAT": "f", "VARCHAR": "s",
    "TIMESTAMP": "t", "TIMESTAMP_NS": "t", "TIMESTAMP_MS": "t",
    "TIMESTAMP_S": "t",
}


def _spark_kind(dt):
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "i"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "f"
    if isinstance(dt, T.StringType):
        return "s"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "t"
    return "?"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_cross_engine_kind_parity(spark, duck, sf_dir, name):
    duck_kinds = {c[0]: _DUCK_KIND.get(str(c[1]).upper(), "?")
                  for c in duck.execute(f"DESCRIBE {_SPECS[name].oracle}").fetchall()}
    spark_kinds = {f.name: _spark_kind(f.dataType)
                   for f in _SPECS[name].fn(spark, sf_dir).schema.fields}
    mismatched = {c: (duck_kinds[c], spark_kinds[c])
                  for c in duck_kinds if c in spark_kinds
                  and duck_kinds[c] != spark_kinds[c]}
    assert not mismatched, f"{name}: cross-engine kind mismatch {mismatched}"


def test_driver_check_bookkeeping_is_outcome_aware():
    """The rotation derives its "already green" set from the committed
    CORRECTNESS_r*.json files: a name whose latest driver row passed counts
    checked; a name whose latest row ERR'd (stream_sessionize_batch in r2)
    must NOT count checked even though the hardcoded fallback lists it —
    and every name with no driver row at all must sort into the front
    window ahead of every checked name."""
    checked = registry._CHECKED
    assert "scan_in_memory" in checked          # green in r2
    # ERR'd in r2; stays unchecked until a LATER round's file records a pass
    if "stream_sessionize_batch" not in registry._PASSED_LATEST:
        assert "stream_sessionize_batch" not in checked
    order = list(registry.specs())
    never_checked = [n for n in order if n not in checked]
    if never_checked:  # all-green registry: nothing left to front-load
        # Unchecked queries must form a contiguous block ahead of every
        # checked query (minus the pinned reverify prefix): the driver
        # checks a fixed-size prefix per round, so any checked name
        # sorting before an unchecked one wastes a hard-signal slot.
        # (More unchecked names than the ~50-slot window is legitimate —
        # the overflow fronts itself next round via the outcome-aware
        # bookkeeping.)
        reverify = set(registry._REVERIFY_FIRST)
        last_unchecked = max(order.index(n) for n in never_checked)
        checked_before = [n for n in order[:last_unchecked]
                          if n in checked and n not in reverify]
        assert not checked_before, checked_before
