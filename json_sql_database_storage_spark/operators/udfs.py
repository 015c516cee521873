"""UDF / UDAF / UDTF surface (SURVEY.md §2 B10).

These exist to prove the extension surface, not to compute things built-ins
already do (the hot path everywhere else in this engine is JVM expressions).
Preference order when extending the engine for real: built-in composition →
Arrow-vectorized pandas UDF → applyInPandas/mapInPandas → row-at-a-time UDF
(last resort; kept here only as the b10.1 exhibit).

All rows-only for the driver (no SQL twin); tests/test_udfs.py asserts each
UDF result equals its built-in equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table


# b10.1 scalar row-at-a-time Python UDF (the slow path, deliberately)
@register("udf_scalar_python", oracle=None, tags=("b10.1",))
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.IntegerType())
    def token_count(text: str) -> int:
        return len(text.split()) if text else 0

    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", token_count("text").alias("n_tokens"))
            .orderBy("doc_id"))


# b10.2 Arrow-vectorized scalar pandas UDF: embedding L2 norm via numpy
@register("udf_pandas_vectorized", oracle=None, tags=("b10.2",))
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(lambda v: float(np.sqrt(np.dot(
            np.asarray(v, dtype=np.float64), np.asarray(v, dtype=np.float64)))))

    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("vec_id", l2_norm("embedding").alias("norm"))
            .orderBy("vec_id"))


# b10.3 grouped-aggregate pandas UDF (UDAF): trimmed mean per user
@register("udf_grouped_agg", oracle=None, tags=("b10.3",))
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        if len(v) < 3:
            return float(v.mean())
        s = v.sort_values()
        return float(s.iloc[1:-1].mean())

    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(trimmed_mean("value").alias("trimmed_mean_value"))
            .orderBy("user_id"))


# b10.4 grouped-map applyInPandas (UDTF-like): per-user z-score normalize
@register("udf_apply_in_pandas", oracle=None, tags=("b10.4",))
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        pdf["value_z"] = 0.0 if std == 0 else (pdf["value"] - pdf["value"].mean()) / std
        return pdf[["user_id", "event_id", "value", "value_z"]]

    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .applyInPandas(zscore,
                           "user_id BIGINT, event_id BIGINT, "
                           "value DOUBLE, value_z DOUBLE")
            .orderBy("event_id"))


# b10.5 mapInPandas (table function over Arrow batches): running flags +
# derived columns without a shuffle
@register("udf_map_in_pandas", oracle=None, tags=("b10.5",))
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["event_id", "value"]].copy()
            out["value_sq"] = pdf["value"] ** 2
            out["is_high"] = pdf["value"] > 100.0
            yield out

    ev = load_table(spark, sf_dir, "events")
    return (ev.mapInPandas(enrich,
                           "event_id BIGINT, value DOUBLE, "
                           "value_sq DOUBLE, is_high BOOLEAN")
            .orderBy("event_id"))
