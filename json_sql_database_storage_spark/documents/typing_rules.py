"""Reference type-inference rules (SURVEY.md §1.3; DatabaseManager.java:514-534).

The reference classifies every JSON value at write time:

- NUMBER: any int-parseable value, including strings like "007"
  (DatabaseManager.java:517-521 — getAsInt succeeds).  Lossy for the string
  case, so the string→int collapse is behind ``compat_int_strings`` and OFF
  by default (SURVEY.md §2-A bug list #6).
- DATE: key name contains "time" (case-insensitive) AND the value contains
  ':' AND 'T' — an ISO-8601 heuristic (DatabaseManager.java:523-526).  This
  rule IS the reference's surface, so it's on by default.
- MEDIUM_STRING/TEXT: length threshold 128 (:528-531) — irrelevant under
  Spark's StringType (no width classes); preserved only as metadata.

Booleans/floats have no write-side branch in the reference (they fall through
to strings); this engine keeps them natively typed — a documented divergence
(SURVEY.md §1.3 "additional type behaviors").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# value looks ISO-8601-ish: reference checks contains(':') && contains('T')
_ISO_HEURISTIC = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"


def is_time_key(name: str) -> bool:
    """DatabaseManager.java:523 — key name contains 'time', case-insensitive."""
    return "time" in name.lower()


def classify(key: str, value) -> str:
    """Classify one primitive the way the reference would (golden-test hook).
    Returns one of NUMBER / DATE / MEDIUM_STRING / TEXT / BOOLEAN / FLOAT."""
    if isinstance(value, bool):
        return "BOOLEAN"          # divergence: reference stores as string
    if isinstance(value, int):
        return "NUMBER"
    if isinstance(value, float):
        return "FLOAT"            # divergence: reference stores as string
    s = str(value)
    # anchored ASCII-digit rule, same predicate _all_match uses for the
    # column rewrite — lstrip('+-').isdigit() wrongly accepted '+-12' and
    # unicode digits, which the reference's getAsInt rejects
    if re.fullmatch(r"[+-]?\d+", s, re.ASCII):
        return "NUMBER"           # the "007" collapse (:517-521)
    if is_time_key(key) and ":" in s and "T" in s:
        return "DATE"
    return "MEDIUM_STRING" if len(s) < 128 else "TEXT"


def apply_reference_typing(df: DataFrame, *,
                           compat_int_strings: bool = False) -> DataFrame:
    """Post-inference column rewrites applying the reference's rules to a
    JSON-inferred DataFrame (top-level string columns only; nested structs
    are handled field-by-field during shredding).

    - string columns whose NAME contains 'time': values matching the ISO
      heuristic are parsed to timestamp (rule :523-526).
    - with compat_int_strings=True, string columns are collapsed to long
      when int-parseable (rule :517-521; lossy, default off).
    """
    for field in df.schema.fields:
        if not isinstance(field.dataType, T.StringType):
            continue
        col = F.col(field.name)
        if is_time_key(field.name) and _all_match(df, field.name, _ISO_HEURISTIC):
            df = df.withColumn(field.name, F.to_timestamp(col))
        elif compat_int_strings and _all_match(df, field.name, r"^[+-]?\d+$"):
            df = df.withColumn(field.name, col.cast("long"))
    return df


def classify_expr(key: F.Column, value: F.Column) -> F.Column:
    """The string-value half of :func:`classify` as a JVM-side column
    expression — the form the engine actually evaluates at data scale
    (A15 numeric introspection; DatabaseManager.java:514-534).  Branch
    order matters and mirrors the reference exactly: int-parseable wins
    over the time-key heuristic, which wins over the length classes.
    Typed (non-string) JSON primitives never reach this expression — they
    keep their parsed Spark types (the documented §1.3 divergence) — so
    only the four string-side classes appear here."""
    s = value.cast("string")
    return (
        F.when(s.rlike(r"^[+-]?[0-9]+$"), F.lit("NUMBER"))
         .when(F.lower(key).contains("time")
               & s.contains(":") & s.contains("T"), F.lit("DATE"))
         .when(F.length(s) < 128, F.lit("MEDIUM_STRING"))
         .otherwise(F.lit("TEXT")))


def _all_match(df: DataFrame, name: str, pattern: str) -> bool:
    """Column-level decision mirroring the reference's per-value typing: a
    relational column can hold only one type, so rewrite only when every
    non-null value satisfies the rule (otherwise the cast would null out the
    stragglers — lossier than the reference)."""
    bad = df.filter(F.col(name).isNotNull()
                    & ~F.col(name).rlike(pattern)).limit(1).count()
    return bad == 0
