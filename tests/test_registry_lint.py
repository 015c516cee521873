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
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S",
})

_SPARK_OK_TYPES = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.StringType, T.BooleanType,
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
