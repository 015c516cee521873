"""Property-based tests (hypothesis) for the bit-level primitives behind
the dedup and layout operators: the hashed-shingle rewrite and the Morton
(Z-order) interleave.  These pin the *mathematical* claims the operator
docstrings make, independent of any corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# -- Morton interleave: pure-python twin of operators/scans.py::_morton16 --


def _py_morton16(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _py_deinterleave(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(16):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@given(st.integers(0, 65535), st.integers(0, 65535))
def test_morton16_is_a_bijection(a, b):
    """Interleaving must lose nothing: de-interleaving recovers both keys
    exactly — this is what makes per-file z-ranges translate back into
    min/max bounds on BOTH dimensions (the b1.15 skipping argument)."""
    z = _py_morton16(a, b)
    assert 0 <= z < (1 << 32)
    assert _py_deinterleave(z) == (a, b)


@given(st.integers(0, 65534), st.integers(0, 65535))
def test_morton16_orders_high_bits_first(a, b):
    """Incrementing a key's high bit moves the code further than any
    lower-bit change — the property that makes sorting by z-code cluster
    both dimensions coarsest-first."""
    hi = _py_morton16(a | 0x8000, b)
    lo = _py_morton16(a & 0x7FFF, b)
    assert hi > lo


def test_morton16_matches_spark_expression(spark):
    """The JVM expression form computes the same codes as the python twin
    on exhaustive low-range + boundary inputs."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.operators.scans import _morton16

    pairs = [(a, b) for a in [0, 1, 2, 3, 255, 32767, 65535]
             for b in [0, 1, 2, 3, 255, 32767, 65535]]
    df = spark.createDataFrame(pairs, "a LONG, b LONG").select(
        "a", "b", _morton16(F.col("a"), F.col("b")).alias("z"))
    for r in df.collect():
        assert r["z"] == _py_morton16(r["a"], r["b"]), (r["a"], r["b"])


# -- Hashed shingles: set-cardinality equivalence with string shingles --


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from("ab cd ef gh ij kl".split()),
                min_size=0, max_size=12),
       st.integers(2, 5))
def test_hashed_shingles_match_string_shingles(spark, tokens, k):
    """For whitespace-free tokens, the k-token hash tuple and the joined
    k-gram string induce the same distinct-shingle partition (modulo
    xxhash64 collisions, absent at this scale): same count, and equal
    token windows map to equal hashes.  This is the injectivity claim the
    minhash rewrite rests on — now parameterized over k after the k=3
    hardcoding bug."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.dedup import _hashed_shingles_of

    df = spark.createDataFrame([(tokens,)], "t ARRAY<STRING>").select(
        F.size(_hashed_shingles_of(F.col("t"), k=k)).alias("n_hashed"))
    n_hashed = df.first()["n_hashed"]
    if len(tokens) >= k:
        expect = len({tuple(tokens[i:i + k])
                      for i in range(len(tokens) - k + 1)})
    else:
        expect = 1  # whole-doc fallback shingle
    assert n_hashed == expect


# -- byte-size conf parsing: sources/tables.py::_parse_bytes ----------------

_SUFFIX_SCALE = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                 "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
                 "t": 1 << 40, "tb": 1 << 40, "p": 1 << 50, "pb": 1 << 50}


@given(st.integers(0, 10**12),
       st.sampled_from(sorted(_SUFFIX_SCALE)),
       st.sampled_from(["", " ", "  "]),
       st.booleans())
def test_parse_bytes_accepts_every_spark_form(n, suffix, pad, upper):
    """Every (number, JVM suffix, whitespace, case) combination a human or
    Spark itself can put in maxPartitionBytes parses to the exact byte
    count — the fallback default must only ever cover malformed values."""
    from json_sql_database_storage_spark.sources.tables import _parse_bytes

    text = f"{pad}{n}{pad}{suffix.upper() if upper else suffix}{pad}"
    assert _parse_bytes(text) == n * _SUFFIX_SCALE[suffix]


@given(st.sampled_from(["", "12x", "mb", "1.5m", "-3k", "12 34", "0x10"]))
def test_parse_bytes_rejects_malformed(text):
    import pytest

    from json_sql_database_storage_spark.sources.tables import _parse_bytes

    with pytest.raises(ValueError):
        _parse_bytes(text)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "ab", "ba"]),
                min_size=0, max_size=10),
       st.sampled_from(["a", "b", "ab", "ba"]),
       st.sampled_from(["a", "b", "ab", "ba"]))
def test_bpe_merge_fold_matches_python_greedy(spark, syms, a, b):
    """r7.1: the HOF merge_fold must implement EXACTLY the greedy
    left-to-right non-overlapping merge the Python reference tokenizer
    (and the DuckDB oracle's reduce) runs — including the adversarial
    cases where a merged token equals `a` again ("aa" from a=b="a"-style
    chains) and where multi-char symbols alias the pair parts."""
    from json_sql_database_storage_spark.llm.bpe import merge_fold
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType([StructField("syms", ArrayType(StringType()))])
    df = spark.createDataFrame([(syms,)], schema)
    got = df.select(merge_fold(F.col("syms"), F.lit(a), F.lit(b))
                    .alias("out")).collect()[0]["out"]

    if len(syms) <= 1:
        expected = syms
    else:
        expected = [syms[0]]
        for x in syms[1:]:
            if expected[-1] == a and x == b:
                expected[-1] = a + b
            else:
                expected.append(x)
    assert got == expected, (syms, a, b, got, expected)
