"""Staged-protocol pins + property tests for llm/staged.py.

Round 7 built `sim_random_projection_topk` and `dedup_quality_survivor`
as STAGED payloads with driver-identical differential tests here; round 8
promoted both into the live registry (r7 verdict next-round #1), so the
differential coverage now runs through tests/test_oracle.py.  What remains
here: the promotion/no-collision protocol pins plus the two property
contracts that SQL equivalence alone can't express (the JL distortion
band and the quality-survivor divergence-from-min-id guarantee).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from json_sql_database_storage_spark.llm.staged import STAGED, jl_matrix

_PROMOTED = ("sim_random_projection_topk", "dedup_quality_survivor")


def test_round8_promotion_landed():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    specs = registry.specs()
    missing = [n for n in _PROMOTED if n not in specs]
    assert not missing, f"staged queries never registered: {missing}"
    without_oracle = [n for n in _PROMOTED if specs[n].oracle is None]
    assert not without_oracle, without_oracle


def test_staged_names_do_not_collide_with_registry():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    overlap = set(STAGED) & set(registry.specs())
    assert not overlap, (
        f"staged queries already registered: {sorted(overlap)} — drop the "
        f"STAGED entry after promoting one")


@pytest.mark.parametrize("sfn", ["0.001", "0.01"])
def test_jl_projection_distortion_band(duck, sfn):
    """The JL contract is DISTANCE preservation, not rank preservation:
    E[|Px−Py|²] = |x−y|² for the ±1/√k sign matrix (Achlioptas 2003),
    with per-pair concentration ~√(2/k).  Pin the measured band on every
    query-to-corpus pair: mean ratio within 10% of 1, 1st/99th
    percentiles inside [0.25, 2.5] (measured 0.36–0.41 / 1.84–1.92 at
    k=16).  Top-k RANK recall is deliberately not the contract — this
    corpus is weakly clustered (near-random margins), where rank
    preservation needs dims ~ log(n)/margin², not 16; production stacks
    a projected-space shortlist under an exact re-rank instead."""
    emb = duck.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('/root/testdata/sf{sfn}/embeddings.parquet') "
        f"ORDER BY vec_id").df()
    X = np.array([np.array(e, dtype=np.float64) for e in emb.embedding])
    P = np.array(jl_matrix()).T           # 64 × 16
    Y = X @ P
    ratios = []
    for qi in range(5):
        dt = ((X - X[qi]) ** 2).sum(1)
        dp = ((Y - Y[qi]) ** 2).sum(1)
        m = np.arange(len(X)) != qi
        ratios.append(dp[m] / np.maximum(dt[m], 1e-12))
    r = np.concatenate(ratios)
    assert 0.9 < float(r.mean()) < 1.1, r.mean()
    assert float(np.percentile(r, 1)) > 0.25, np.percentile(r, 1)
    assert float(np.percentile(r, 99)) < 2.5, np.percentile(r, 99)


def test_quality_survivor_diverges_from_min_id(spark, sf_dir):
    """The point of quality-weighted survivorship: on the dup-injected
    corpus the ' zzzz'-appended near-copies carry one extra distinct
    token, so a substantial share of components must elect a NON-minimal
    id (min-id survivorship would return component_id itself), and every
    survivor must be a member of its own component."""
    from json_sql_database_storage_spark.llm.staged import dedup_quality_survivor

    out = dedup_quality_survivor(spark, sf_dir).collect()
    assert len(out) > 0
    diverged = 0
    for row in out:
        members = json.loads(row["members"])
        assert row["survivor_id"] in members
        assert row["component_id"] == min(members)
        if row["survivor_id"] != row["component_id"]:
            diverged += 1
    assert diverged > 0, "no component elected a non-minimal survivor"
