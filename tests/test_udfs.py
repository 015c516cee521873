"""B10 UDF surface: each UDF's result must equal its built-in equivalent."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_sql_database_storage_spark import registry
from json_sql_database_storage_spark.sources import load_table

registry.load_all()
_SPECS = registry.specs()


def test_scalar_udf_equals_builtin(spark, sf_dir):
    got = {r["doc_id"]: r["n_tokens"]
           for r in _SPECS["udf_scalar_python"].fn(spark, sf_dir).collect()}
    want = {r["doc_id"]: r["n"]
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", F.size(F.split("text", r"\s+")).alias("n"))
            .collect()}
    assert got == want


def test_pandas_udf_equals_builtin(spark, sf_dir):
    got = {r["vec_id"]: r["norm"]
           for r in _SPECS["udf_pandas_vectorized"].fn(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "embeddings").collect()
    for r in rows:
        want = math.sqrt(sum(float(x) * float(x) for x in r["embedding"]))
        assert got[r["vec_id"]] == pytest.approx(want, rel=1e-9)


def test_grouped_agg_udaf(spark, sf_dir):
    got = {r["user_id"]: r["trimmed_mean_value"]
           for r in _SPECS["udf_grouped_agg"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").collect()
    by_user: dict[int, list[float]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["value"])
    for uid, vals in by_user.items():
        vals.sort()
        want = (sum(vals) / len(vals) if len(vals) < 3
                else sum(vals[1:-1]) / (len(vals) - 2))
        assert got[uid] == pytest.approx(want, rel=1e-9)


def test_apply_in_pandas_zscore(spark, sf_dir):
    out = _SPECS["udf_apply_in_pandas"].fn(spark, sf_dir).collect()
    # z-scores per user must sum to ~0 and have unit variance (ddof=0)
    by_user: dict[int, list[float]] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["value_z"])
    for vals in by_user.values():
        if len(vals) > 1 and any(v != 0 for v in vals):
            mean = sum(vals) / len(vals)
            var = sum((v - mean) ** 2 for v in vals) / len(vals)
            assert mean == pytest.approx(0.0, abs=1e-9)
            assert var == pytest.approx(1.0, rel=1e-6)


def test_map_in_pandas(spark, sf_dir):
    out = _SPECS["udf_map_in_pandas"].fn(spark, sf_dir).collect()
    assert all(r["value_sq"] == pytest.approx(r["value"] ** 2) for r in out)
    assert all(r["is_high"] == (r["value"] > 100.0) for r in out)
