"""Build/probe split for the shared co-purchase edge artifact
(operators/graph_edges.py — r10 verdict next-round #3).

The four registered graph queries remain the driver/oracle surface and
(since r11) SERVE FROM the artifact — build-once per (session, source),
probe-many; these tests pin that (a) the artifact holds exactly the
canonical edge list, (b) every probe form is ROW-IDENTICAL to the
one-shot LOGICAL-PLAN twin fed through the same census, (c) commits are
CAS-versioned with AS-OF reads, (d) an uncommitted (crashed) build is
invisible to probes, and (e) consecutive registered calls reuse one
build — the same contracts the BM25 and IVFPQ artifacts carry.
"""

from __future__ import annotations

import os

import pytest

from json_sql_database_storage_spark.operators.graph_edges import (
    copurchase_edges_plan,
    degree_assortativity_probe,
    degree_histogram_probe,
    edges_build,
    edges_load,
    edges_stats,
    kcore_probe,
    triangle_count_probe,
)


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    return edges_build(spark, sf_dir, "copurchase_edges_test")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_artifact_holds_the_canonical_edges(spark, sf_dir, built):
    assert (_rows(edges_load(spark, built))
            == _rows(copurchase_edges_plan(spark, sf_dir)))


def test_manifest_stats_match_data(spark, sf_dir, built):
    stats = edges_stats(built)
    edges = edges_load(spark, built)
    assert stats["n_edges"] == edges.count()
    nodes = edges.select("pa").union(edges.select("pb")).distinct().count()
    assert stats["n_nodes"] == nodes


def test_triangle_probe_matches_plan_form(spark, sf_dir, built):
    """The registered query now serves from the artifact (build-once/
    probe-many) — the verification twin is the ONE-SHOT LOGICAL PLAN fed
    through the same census, so artifact content and plan content are
    pinned equal end-to-end."""
    from json_sql_database_storage_spark.operators.staged_r9 import (
        triangle_census,
    )

    assert (_rows(triangle_count_probe(spark, built))
            == _rows(triangle_census(
                spark, copurchase_edges_plan(spark, sf_dir))))


def test_kcore_probe_matches_plan_form(spark, sf_dir, built):
    from json_sql_database_storage_spark.operators.staged_r9 import (
        kcore_trajectory,
    )

    assert (_rows(kcore_probe(spark, built))
            == _rows(kcore_trajectory(
                spark, copurchase_edges_plan(spark, sf_dir))))


def test_assortativity_probe_matches_plan_form(spark, sf_dir, built):
    from json_sql_database_storage_spark.operators.staged_r10 import (
        _symmetrize, degree_assortativity_from_edges,
    )

    assert (_rows(degree_assortativity_probe(spark, built))
            == _rows(degree_assortativity_from_edges(
                _symmetrize(copurchase_edges_plan(spark, sf_dir)))))


def test_histogram_probe_matches_plan_form(spark, sf_dir, built):
    from json_sql_database_storage_spark.operators.staged_r10 import (
        _symmetrize, degree_histogram_from_edges,
    )

    assert (_rows(degree_histogram_probe(spark, built))
            == _rows(degree_histogram_from_edges(
                _symmetrize(copurchase_edges_plan(spark, sf_dir)))))


def test_registered_queries_reuse_one_build_per_source(spark, sf_dir):
    """All four registered graph queries share ONE artifact build per
    (session, source): consecutive calls must not bump the committed
    version, and a different source must trigger a rebuild."""
    from json_sql_database_storage_spark.operators.graph_edges import (
        _edge_paths, edges_for,
    )
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )
    from json_sql_database_storage_spark.operators.staged_r10 import (
        graph_degree_assortativity, graph_degree_histogram,
    )

    paths = _edge_paths(spark, "copurchase_edges")
    graph_degree_histogram(spark, sf_dir).collect()
    v0 = current_version(paths["meta"])
    graph_degree_assortativity(spark, sf_dir).collect()
    assert current_version(paths["meta"]) == v0     # reused, not rebuilt
    assert edges_for(spark, sf_dir) == paths
    assert current_version(paths["meta"]) == v0
    other = "/root/testdata/sf0.01"
    if other != sf_dir:
        edges_for(spark, other)
        assert current_version(paths["meta"]) == v0 + 1   # source changed


def test_rebuild_bumps_version_and_as_of_reads(spark, sf_dir):
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )

    paths = edges_build(spark, sf_dir, "copurchase_edges_rebuild")
    v0 = current_version(paths["meta"])
    before = _rows(edges_load(spark, paths))
    paths2 = edges_build(spark, sf_dir, "copurchase_edges_rebuild")
    assert paths2 == paths
    v1 = current_version(paths["meta"])
    assert v1 == v0 + 1
    # current read serves the new build; AS-OF pins the old one
    assert _rows(edges_load(spark, paths)) == before
    assert _rows(edges_load(spark, paths, version=v0)) == before
    assert edges_stats(paths, v0) == edges_stats(paths, v1)


def test_uncommitted_segment_is_invisible(spark, sf_dir):
    """Crash-window contract: data written under seg=N+1 WITHOUT a
    manifest claim must not leak into reads (the index-segment
    discipline)."""
    from pyspark.sql import functions as F

    paths = edges_build(spark, sf_dir, "copurchase_edges_crash")
    before = _rows(edges_load(spark, paths))
    # simulate a writer that crashed after the data write, before the CAS
    (edges_load(spark, paths).limit(5)
     .select(F.col("pa") + 1000000, F.col("pb") + 1000000)
     .toDF("pa", "pb")
     .withColumn("seg", F.lit(1).cast("int"))
     .write.mode("append").partitionBy("seg").parquet(paths["data"]))
    assert os.path.isdir(os.path.join(paths["data"], "seg=1"))
    assert _rows(edges_load(spark, paths)) == before
    # the next build CLEARS the orphan before rewriting seg=1
    edges_build(spark, sf_dir, "copurchase_edges_crash")
    assert _rows(edges_load(spark, paths)) == before


def test_vacuum_reclaims_only_unreferenced_segments(spark, sf_dir):
    """edges_vacuum expires old manifests, moves the version floor, and
    deletes exactly the seg dirs no retained manifest references — the
    retained head keeps reading; the expired version raises; a second
    vacuum is a no-op (idempotence)."""
    from json_sql_database_storage_spark.operators.graph_edges import (
        edges_vacuum,
    )
    from json_sql_database_storage_spark.operators.snapshots import (
        version_floor,
    )

    paths = edges_build(spark, sf_dir, "copurchase_edges_vac")
    head_rows = _rows(edges_load(spark, paths))
    edges_build(spark, sf_dir, "copurchase_edges_vac")      # v1, seg=1
    deleted = edges_vacuum(paths, keep_last=1)
    assert any("seg=0" in d for d in deleted)
    assert version_floor(paths["meta"]) == 1
    assert _rows(edges_load(spark, paths)) == head_rows     # head survives
    with pytest.raises(FileNotFoundError):
        edges_load(spark, paths, version=0)                 # expired
    assert edges_vacuum(paths, keep_last=1) == []           # idempotent
    # and the next build still commits cleanly above the floor
    edges_build(spark, sf_dir, "copurchase_edges_vac")
    assert _rows(edges_load(spark, paths)) == head_rows


def test_concurrent_builder_is_rejected(spark, sf_dir):
    from json_sql_database_storage_spark.llm.search import (
        ConcurrentIndexWriter, _index_write_lock,
    )
    from json_sql_database_storage_spark.operators.graph_edges import (
        _edge_paths,
    )

    paths = _edge_paths(spark, "copurchase_edges_locked")
    with _index_write_lock(paths["meta"]):
        with pytest.raises(ConcurrentIndexWriter):
            edges_build(spark, sf_dir, "copurchase_edges_locked")


def test_source_mutation_triggers_rebuild(spark, sf_dir, tmp_path):
    """r12 (r11 advice #1): edges_for keys reuse on the source's CONTENT
    fingerprint, not just its path — regenerating the data under sf_dir
    within a session must rebuild, never silently serve stale edges
    (the registered graph rows were pure functions of the live source
    before the artifact landed)."""
    import shutil

    from json_sql_database_storage_spark.operators.graph_edges import (
        edges_for,
    )
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )

    src = tmp_path / "mutsrc"
    src.mkdir()
    li = os.path.join(sf_dir, "lineitem.parquet")
    dst = str(src / "lineitem.parquet")
    (shutil.copytree if os.path.isdir(li) else shutil.copyfile)(li, dst)
    paths = edges_for(spark, str(src), "copurchase_edges_fp")
    v0 = current_version(paths["meta"])
    before = _rows(edges_load(spark, paths))
    # unchanged source: reuse (no version bump)
    assert edges_for(spark, str(src), "copurchase_edges_fp") == paths
    assert current_version(paths["meta"]) == v0
    # "regenerate" the source in place: same path, new mtime.  Bump
    # EVERY file past the current maximum — nudging one file by +1 s
    # would not move max_mtime_ns when a sibling (_SUCCESS, a later
    # part file) already carries a newer stamp
    files = ([dst] if os.path.isfile(dst) else
             [os.path.join(r, f) for r, _, fs in os.walk(dst) for f in fs])
    top = max(os.stat(f).st_mtime_ns for f in files) + 10**9
    for f in files:
        os.utime(f, ns=(os.stat(f).st_atime_ns, top))
    edges_for(spark, str(src), "copurchase_edges_fp")
    assert current_version(paths["meta"]) == v0 + 1     # rebuilt
    assert _rows(edges_load(spark, paths)) == before    # same source data


def test_concurrent_edges_for_waits_and_reuses(spark, sf_dir):
    """r12 (r11 advice #2): two registered consumers racing into a cold
    artifact must both succeed — the lock loser waits for the in-flight
    build to commit and reuses it (exactly ONE committed version), never
    surfacing ConcurrentIndexWriter to a read-only query."""
    import threading

    from json_sql_database_storage_spark.operators.graph_edges import (
        edges_for,
    )
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )

    results, errors = {}, {}

    def run(tag):
        try:
            results[tag] = edges_for(spark, sf_dir,
                                     "copurchase_edges_race",
                                     wait_seconds=120.0)
        except Exception as e:  # surfaced to the assert below
            errors[tag] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results[0] == results[1]
    assert current_version(results[0]["meta"]) == 0     # exactly one build
    assert _rows(edges_load(spark, results[0])) \
        == _rows(copurchase_edges_plan(spark, sf_dir))
