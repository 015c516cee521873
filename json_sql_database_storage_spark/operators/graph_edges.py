"""Shared co-purchase edge artifact — the build/probe split for the graph
family (r10 verdict next-round #3).

graph_triangle_count, graph_kcore, graph_degree_assortativity and
graph_degree_histogram each rebuilt the same lineitem self-join edge list,
and that build dominated all four (quiet-machine r10: 12.5 + 6.8 + 3.3 +
2.9 s).  The BM25 precedent (llm/search.py bm25_build / bm25_probe)
applies: build ONCE into a versioned parquet artifact, probe many.  The
registered one-shot query forms stay the driver/oracle surface; each probe
is pinned row-identical to its one-shot twin in tests/test_graph_edges.py.

Artifact layout (the index-segment discipline, llm/search.py:237-519):
canonical undirected edges (pa < pb, DISTINCT) land as invisible ``seg=N``
parquet partition dirs, pre-partitioned on pa so probe-side degree
censuses and the kcore endpoint joins start from write-time locality; a
``commit_manifest`` CAS claim (operators/snapshots.py:417 — write-fsync-
link, put-if-absent) then publishes {segs, n_edges, n_nodes, source}.  A
crash between the data write and the claim leaves the previous version
fully consistent; the orphaned seg dir is cleared by the next writer.
Rebuilds write seg=N+1 and claim the next version — old versions stay
AS-OF readable until vacuumed, and a probe pins the version it opened.
Single-writer per artifact via the shared write.lock (llm/search.py
_index_write_lock: O_EXCL + pid-reuse-safe stale break).

100-TB design: the build pays the one O(Σ items-per-order²) pair
explosion + distinct (bounded per order — never quadratic in the table);
every probe then starts from an O(E) columnar scan of two int64 columns
instead of re-running the self-join.  At 1000-executor scale the artifact
is exactly what a feature-store materialization is: the shuffle-heavy
normalization runs once per ingest, the iterative/analytic consumers run
many times per day against the frozen, pre-partitioned layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

# manifest slots (commit_manifest int-keys the top level)
_M_SEGS, _M_STATS, _M_NEXT, _M_SOURCE = 0, 1, 2, 3

_EDGE_SCHEMA = "pa bigint, pb bigint, seg int"


def copurchase_edges_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical one-shot logical plan: distinct co-purchased part
    pairs (pa < pb) — nodes are parts, an undirected edge means "appeared
    in the same order".  Shared by all four registered graph queries and
    by edges_build; the pair explosion is partition-local per order
    (bounded by items-per-order choose 2), the distinct is the one
    edge-keyed shuffle."""
    items = (load_table(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_partkey").distinct())
    return (items.alias("a")
            .join(items.select("l_orderkey",
                               F.col("l_partkey").alias("pb"))
                  .alias("b"), ["l_orderkey"])
            .filter(F.col("a.l_partkey") < F.col("pb"))
            .select(F.col("a.l_partkey").alias("pa"), "pb")
            .distinct())


def _edge_paths(spark: SparkSession, name: str) -> dict[str, str]:
    from .scans import _sink

    return {"data": _sink(name, spark), "meta": _sink(f"{name}_meta", spark)}


def _source_fingerprint(sf_dir: str) -> dict:
    """Cheap content fingerprint of the artifact's upstream — lineitem
    parquet file count + max mtime + total bytes (metadata stats only,
    no data read).  Recorded in the manifest's source slot so edges_for
    can detect in-session regeneration of the source dir and rebuild
    instead of silently serving stale edges (the registered graph rows
    were pure functions of the live source before the artifact landed —
    reuse must preserve that contract, not just key on the path)."""
    import glob

    path = os.path.join(sf_dir, "lineitem.parquet")
    files = ([path] if os.path.isfile(path) else
             [f for f in glob.glob(os.path.join(path, "**", "*"),
                                   recursive=True) if os.path.isfile(f)])
    n_files, max_mtime_ns, total_bytes = 0, 0, 0
    for f in files:
        try:
            st = os.stat(f)
        except OSError:
            continue    # file swept mid-scan: the counts still differ
        n_files += 1
        max_mtime_ns = max(max_mtime_ns, st.st_mtime_ns)
        total_bytes += st.st_size
    return {"n_files": n_files, "max_mtime_ns": max_mtime_ns,
            "total_bytes": total_bytes}


def _head_matches(paths: dict[str, str], sf_dir: str) -> bool:
    """True when the committed head was built from this sf_dir AND the
    source's fingerprint still matches the one recorded at build time."""
    from .snapshots import current_version

    if not os.path.isdir(paths["meta"]):
        return False
    v = current_version(paths["meta"])
    if v < 0:
        return False
    try:
        slot = _manifest(paths, v)[_M_SOURCE]
        return (slot.get("source") == os.path.abspath(sf_dir)
                and slot.get("fingerprint") == _source_fingerprint(sf_dir))
    except (FileNotFoundError, KeyError, AttributeError):
        return False    # unreadable/legacy manifest: not a match


def _manifest(paths: dict[str, str], version: int | None = None) -> dict:
    from .snapshots import current_version, read_committed_manifest

    v = current_version(paths["meta"]) if version is None else version
    return read_committed_manifest(paths["meta"], v)


def _commit(paths: dict[str, str], manifest: dict) -> None:
    from .snapshots import SnapshotConflict, commit_manifest, current_version

    os.makedirs(paths["meta"], exist_ok=True)
    for _ in range(5):
        try:
            commit_manifest(paths["meta"],
                            current_version(paths["meta"]) + 1, manifest)
            return
        except SnapshotConflict:
            continue
    raise SnapshotConflict(f"edge-artifact commit under {paths['meta']} "
                           f"lost the race 5 times")


def edges_build(spark: SparkSession, sf_dir: str,
                name: str = "copurchase_edges") -> dict[str, str]:
    """Materialize the canonical edge list as a committed artifact and
    return its paths.  Idempotent per (session, name): a rebuild writes
    the next segment and claims the next manifest version (full-refresh
    semantics — the co-purchase graph derives from the whole fact table,
    so a delta-append would need retraction logic the consumers don't
    want; at 100 TB the refresh cadence is the ingest cadence)."""
    from ..llm.search import _index_write_lock
    from .snapshots import current_version

    paths = _edge_paths(spark, name)
    with _index_write_lock(paths["meta"]):
        # fingerprint BEFORE the scan: if the source mutates mid-build the
        # recorded fingerprint disagrees with the post-mutation stat and
        # the next edges_for rebuilds rather than trusting a torn read
        fp = _source_fingerprint(sf_dir)
        v = current_version(paths["meta"])
        seg = int(_manifest(paths, v)[_M_NEXT]) if v >= 0 else 0
        _clear_seg(paths["data"], seg)
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        edges = copurchase_edges_plan(spark, sf_dir)
        (edges.withColumn("seg", F.lit(seg).cast("int"))
         .repartition(n_part, "pa")
         .write.mode("append").partitionBy("seg")
         .parquet(paths["data"]))
        # stats from the WRITTEN rows (1-row scalar over one columnar
        # scan — the manifest must describe what was committed, not what
        # the source would produce if re-run)
        written = (spark.read.schema(_EDGE_SCHEMA).parquet(paths["data"])
                   .filter(F.col("seg") == seg))
        stats = (written.select(F.col("pa").alias("n"))
                 .unionAll(written.select(F.col("pb").alias("n")))
                 .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("m"),
                      F.count_distinct("n").alias("nn")).collect()[0])
        _commit(paths, {_M_SEGS: [seg],
                        _M_STATS: {"n_edges": int(stats["m"]),
                                   "n_nodes": int(stats["nn"])},
                        _M_NEXT: seg + 1,
                        _M_SOURCE: {"source": os.path.abspath(sf_dir),
                                    "fingerprint": fp}})
    return paths


def edges_for(spark: SparkSession, sf_dir: str,
              name: str = "copurchase_edges",
              wait_seconds: float = 600.0) -> dict[str, str]:
    """Build-once-per-source: return the artifact paths, REUSING the
    committed head when its recorded source is this sf_dir AND the
    source's content fingerprint still matches (path alone would serve
    stale edges after an in-session regeneration of the data under
    sf_dir), rebuilding otherwise.  This is what lets all four registered
    graph queries share ONE edge materialization per bench/driver pass
    (the text_bm25_topk build+probe precedent applied family-wide): the
    first consumer pays the self-join, the other three probe the frozen
    layout.  Correctness is invariant to reuse — the artifact's content
    is a pure function of the source (pinned by the probe ≡ plan-form
    tests).

    Two registered consumers racing into a cold artifact must NOT turn
    into a ConcurrentIndexWriter failure (the registered forms were
    side-effect-free pure queries before the artifact landed — inheriting
    the builder's single-writer failure mode would be a regression), so
    the loser waits for the in-flight build to commit and reuses it.
    The build is retried periodically (not only when the lock file
    vanishes): a holder that crashed WITHOUT cleanup leaves the lock on
    disk forever, and only edges_build's own stale-break path (dead pid
    + stale age) can reclaim it."""
    import time

    from ..llm.search import ConcurrentIndexWriter
    from .snapshots import current_version

    paths = _edge_paths(spark, name)
    if _head_matches(paths, sf_dir):
        return paths
    deadline = time.monotonic() + wait_seconds
    lock = os.path.join(paths["meta"], "write.lock")
    while True:
        try:
            return edges_build(spark, sf_dir, name)
        except ConcurrentIndexWriter:
            if time.monotonic() >= deadline:
                raise
            if _head_matches(paths, sf_dir):
                return paths    # the racer committed between our build
                # attempt and here — don't rebuild a redundant version
            # an in-flight builder holds write.lock: poll for its commit
            # for a bounded slice, then loop back to retry the build (the
            # retry is also what breaks a crashed holder's stale lock).
            # The cheap current_version read gates the fingerprint stat
            # walk — the head can only change once per build, so the
            # full-source re-stat runs on version change, not every tick.
            v_seen = current_version(paths["meta"]) \
                if os.path.isdir(paths["meta"]) else -1
            slice_end = min(deadline, time.monotonic() + 5.0)
            while time.monotonic() < slice_end:
                v_now = current_version(paths["meta"]) \
                    if os.path.isdir(paths["meta"]) else -1
                if v_now != v_seen:
                    if _head_matches(paths, sf_dir):
                        return paths    # the racer built what we need
                    v_seen = v_now      # other-source commit: keep waiting
                if not os.path.exists(lock):
                    break    # holder finished or released: retry the build
                time.sleep(0.1)


def _clear_seg(root: str, seg: int) -> None:
    """Remove a possibly-orphaned seg dir before (re)writing it — any
    on-disk seg ≥ the committed next_seg is provably uncommitted (the
    llm/search.py _clear_seg rationale)."""
    import shutil

    p = os.path.join(root, f"seg={seg}")
    if os.path.isdir(p):
        shutil.rmtree(p)


def edges_vacuum(paths: dict[str, str], keep_last: int = 1) -> list[str]:
    """Reclaim rolled-over / orphaned edge segments: expire manifests
    below the keep window (metadata first — the floor moves up so the
    numbers can't be reclaimed by a lagging writer), then delete every
    seg dir no retained manifest references.  Returns deleted dirs.
    Same contract as bm25_vacuum/ivfpq_vacuum: runs under write.lock
    (never sweep an in-flight writer's uncommitted segment), idempotent
    across repeated runs and intervening rebuilds.  Protocol core shared
    with both index vacuums (snapshots.py::vacuum_artifact_segments)."""
    from ..llm.search import _index_write_lock
    from .snapshots import vacuum_artifact_segments

    def live_of(v: int) -> dict[str, set[int]]:
        return {"data": {int(s) for s in _manifest(paths, v)[_M_SEGS]}}

    with _index_write_lock(paths["meta"]):
        return vacuum_artifact_segments(
            paths["meta"], {"data": paths["data"]}, keep_last, live_of)


def edges_stats(paths: dict[str, str], version: int | None = None) -> dict:
    """The committed {n_edges, n_nodes} without touching the data files —
    what a planner consults before choosing a probe strategy."""
    return dict(_manifest(paths, version)[_M_STATS])


def edges_load(spark: SparkSession, paths: dict[str, str],
               version: int | None = None) -> DataFrame:
    """The committed canonical (pa, pb) edge list — the probe input.
    Reads only the manifest's segments, so an in-flight rebuild (data
    written, version unclaimed) is invisible; pass `version` for AS-OF
    reads of a prior build."""
    m = _manifest(paths, version)
    segs = [int(s) for s in m[_M_SEGS]]
    return (spark.read.schema(_EDGE_SCHEMA).parquet(paths["data"])
            .filter(F.col("seg").isin(segs))
            .select("pa", "pb"))


# ---------------------------------------------------------------------------
# Probe forms — the four graph consumers against the frozen artifact.
# Row-identical to their registered one-shot twins (pinned in
# tests/test_graph_edges.py); what changes is only where the edge list
# comes from.
# ---------------------------------------------------------------------------


def triangle_count_probe(spark: SparkSession,
                         paths: dict[str, str]) -> DataFrame:
    from .staged_r9 import triangle_census

    return triangle_census(spark, edges_load(spark, paths))


def kcore_probe(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    from .staged_r9 import kcore_trajectory

    return kcore_trajectory(spark, edges_load(spark, paths))


def degree_assortativity_probe(spark: SparkSession,
                               paths: dict[str, str]) -> DataFrame:
    from .staged_r10 import _symmetrize, degree_assortativity_from_edges

    return degree_assortativity_from_edges(
        _symmetrize(edges_load(spark, paths)))


def degree_histogram_probe(spark: SparkSession,
                           paths: dict[str, str]) -> DataFrame:
    from .staged_r10 import _symmetrize, degree_histogram_from_edges

    return degree_histogram_from_edges(_symmetrize(edges_load(spark, paths)))
