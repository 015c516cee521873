"""Cross-PROCESS concurrency pins (r11 verdict next-round #5).

Every earlier concurrency test (test_store_concurrent_writers_no_lost_updates,
test_index_write_lock_excludes_second_writer, the graph-edges race) runs
threads inside ONE JVM/driver process.  The CAS and write.lock claims rest
on filesystem semantics — O_EXCL create, link(2)-style put-if-absent — that
only a SECOND OS PROCESS genuinely exercises: two drivers sharing a
warehouse is the real multi-writer deployment at the 100-TB design point
(ingest job + compaction job, or two tenants' sessions over one store).

Twin 1 (store): a subprocess with its OWN SparkSession interleaves
append/upsert commits against the main session's DocumentStore on a shared
base dir — every writer's rows must survive (the CAS loser rebases) and
the version count must equal the total commit count, exactly as the
in-process twin pins.

Twin 2 (index write.lock): a second OS process attempting the lock while
this process holds it must be rejected with ConcurrentIndexWriter, and
vice versa — an edges_build in THIS process must be rejected while a
foreign process holds the lock (pid-liveness check crossing process
boundaries, not just thread state).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child payload for the store race: its own SparkSession (second JVM),
# 4 interleaved append/upsert commits with keys 200..203, synchronized
# with the parent through ready/go marker files so the commit windows
# genuinely overlap.
_STORE_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from json_sql_database_storage_spark.session import build_session
from json_sql_database_storage_spark.documents.fixtures import docs_df
from json_sql_database_storage_spark.documents.store import DocumentStore

base, ready, go = sys.argv[1], sys.argv[2], sys.argv[3]
spark = build_session("xproc-store-child", cores=2)
store = DocumentStore(spark, base, n_buckets=4)
open(ready, "w").close()
deadline = time.time() + 120
while not os.path.exists(go):
    if time.time() > deadline:
        raise SystemExit("parent never signalled go")
    time.sleep(0.01)
for i in range(4):
    k = 200 + i
    df = docs_df(spark, [{{"rowNum": k, "name": "c-%d" % i, "v": k}}])
    if i % 2 == 0:
        store.append(df, "things")
    else:
        store.upsert(df, "things")
spark.stop()
"""

# Child payload for the full-verb-alphabet race: like _STORE_CHILD but
# the sequence walks append → upsert → MERGE (update) → MERGE with a
# delete_when clause → delete → upsert over the child's OWN key range.
# Disjoint ranges make each range's final state deterministic while the
# bucket-granular COW still interleaves both writers' buckets — the
# rebase path merge/delete exercise that append/upsert alone do not.
_STORE_VERBS_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from json_sql_database_storage_spark.session import build_session
from json_sql_database_storage_spark.documents.fixtures import docs_df
from json_sql_database_storage_spark.documents.store import DocumentStore

base, ready, go = sys.argv[1], sys.argv[2], sys.argv[3]
off = int(sys.argv[4])
spark = build_session("xproc-verbs-child", cores=2)
store = DocumentStore(spark, base, n_buckets=4)
open(ready, "w").close()
deadline = time.time() + 120
while not os.path.exists(go):
    if time.time() > deadline:
        raise SystemExit("parent never signalled go")
    time.sleep(0.01)

def rows(ks, v):
    return docs_df(spark, [{{"rowNum": k, "name": "n%d" % k, "v": v}}
                           for k in ks])

ks = list(range(off, off + 4))
store.append(rows(ks, 1), "things")                      # all 4 at v=1
store.upsert(rows(ks[:2], 2), "things")                  # k0,k1 -> 2
store.merge(rows(ks[1:3], 3), "things")                  # k1,k2 -> 3
store.merge(rows(ks[3:], 9), "things", delete_when="v = 9")  # k3 deleted
store.delete(rows(ks[:1], 0).select("rowNum"), "things")     # k0 gone
store.upsert(rows([ks[0]], 5), "things")                 # k0 back at 5
spark.stop()
"""

# Final v per surviving key for the 6-op sequence above, keyed by offset
# position: k0=5 (deleted then re-upserted), k1=3, k2=3; k3 deleted.
_VERBS_FINAL = {0: 5, 1: 3, 2: 3}


# Child payload for the lock tests: NO Spark — the lock is pure
# filesystem, which is exactly the cross-process surface under test.
# mode=acquire-expect-reject: try the lock once, exit 0 iff rejected.
# mode=hold: take the lock, signal ready, hold until the go file appears.
_LOCK_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from json_sql_database_storage_spark.llm.search import (
    ConcurrentIndexWriter, _index_write_lock,
)

mode, meta = sys.argv[1], sys.argv[2]
if mode == "acquire-expect-reject":
    try:
        with _index_write_lock(meta):
            raise SystemExit("acquired a lock another process holds")
    except ConcurrentIndexWriter:
        raise SystemExit(0)
elif mode == "hold":
    ready, go = sys.argv[3], sys.argv[4]
    with _index_write_lock(meta):
        open(ready, "w").close()
        deadline = time.time() + 120
        while not os.path.exists(go):
            if time.time() > deadline:
                raise SystemExit("parent never signalled go")
            time.sleep(0.01)
else:
    raise SystemExit("unknown mode %r" % mode)
"""


def _spawn(payload: str, *argv: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")
    return subprocess.Popen(
        [sys.executable, "-c", payload.format(repo=_REPO), *argv],
        cwd=_REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _wait_file(path: str, seconds: float, proc: subprocess.Popen) -> None:
    deadline = time.time() + seconds
    while not os.path.exists(path):
        if proc.poll() is not None:
            out, err = proc.communicate()
            raise AssertionError(
                f"child exited early rc={proc.returncode}\n{out}\n{err}")
        if time.time() > deadline:
            proc.kill()
            raise AssertionError(f"timed out waiting for {path}")
        time.sleep(0.05)


@pytest.mark.slow
def test_store_cross_process_writers_no_lost_updates(spark, tmp_path):
    """Two OS processes (two JVMs, two SparkSessions) interleave commits
    on one shared store — the commit CAS must serialize them with zero
    lost updates, exactly as the in-thread twin pins."""
    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.store import DocumentStore

    base = str(tmp_path / "collections")
    ready, go = str(tmp_path / "ready"), str(tmp_path / "go")
    store = DocumentStore(spark, base, n_buckets=4)
    store.upsert(docs_df(spark, [{"rowNum": 0, "name": "seed", "v": 0}]),
                 "things")
    child = _spawn(_STORE_CHILD, base, ready, go)
    try:
        # child session is up and its store handle open — overlap is real
        _wait_file(ready, 180, child)
        open(go, "w").close()
        for i in range(4):
            k = 100 + i
            df = docs_df(spark, [{"rowNum": k, "name": f"p-{i}", "v": k}])
            if i % 2 == 0:
                store.append(df, "things")
            else:
                store.upsert(df, "things")
        out, err = child.communicate(timeout=240)
        assert child.returncode == 0, f"child failed rc={child.returncode}\n{out}\n{err}"
    finally:
        if child.poll() is None:
            child.kill()
    rows = {r["rowNum"]: r for r in store.read("things").collect()}
    expected = {0} | {100 + i for i in range(4)} | {200 + i for i in range(4)}
    assert set(rows) == expected        # no lost updates across processes
    assert store.version("things") == 8  # seed + 2 processes × 4 commits


@pytest.mark.slow
def test_store_cross_process_full_verb_alphabet(spark, tmp_path):
    """The model-based random-op culture crossed with the process
    boundary: BOTH processes run the full verb walk (append → upsert →
    merge → merge+delete_when → delete → re-upsert) on disjoint key
    ranges of ONE table.  Disjoint ranges make each range's final state
    deterministic under any interleaving, while merge/delete's
    bucket-granular COW rebases against the other process's commits —
    the path the append/upsert-only twin never exercises."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.store import DocumentStore

    base = str(tmp_path / "collections")
    ready, go = str(tmp_path / "ready"), str(tmp_path / "go")
    store = DocumentStore(spark, base, n_buckets=4)
    store.upsert(docs_df(spark, [{"rowNum": 0, "name": "seed", "v": 0}]),
                 "things")
    child = _spawn(_STORE_VERBS_CHILD, base, ready, go, "200")
    try:
        _wait_file(ready, 180, child)
        open(go, "w").close()

        def rows(ks, v):
            return docs_df(spark, [{"rowNum": k, "name": f"n{k}", "v": v}
                                   for k in ks])

        ks = list(range(100, 104))
        store.append(rows(ks, 1), "things")
        store.upsert(rows(ks[:2], 2), "things")
        store.merge(rows(ks[1:3], 3), "things")
        store.merge(rows(ks[3:], 9), "things", delete_when="v = 9")
        store.delete(rows(ks[:1], 0).select("rowNum"), "things")
        store.upsert(rows([ks[0]], 5), "things")
        out, err = child.communicate(timeout=240)
        assert child.returncode == 0, (
            f"child failed rc={child.returncode}\n{out}\n{err}")
    finally:
        if child.poll() is None:
            child.kill()
    got = {r["rowNum"]: r["v"] for r in store.read("things").collect()}
    expected = {0: 0}
    for off in (100, 200):
        expected.update({off + p: v for p, v in _VERBS_FINAL.items()})
    assert got == expected      # every range's walk survived verbatim
    # versions are 0-based: seed is v0, then 2 processes × 6 commits
    assert store.version("things") == 12


def test_index_write_lock_excludes_second_process(tmp_path):
    """A second OS process attempting write.lock while THIS process holds
    it is rejected — O_EXCL + pid-liveness crossing the process boundary
    (os.kill(pid, 0) against a real foreign pid, not a thread)."""
    from json_sql_database_storage_spark.llm.search import _index_write_lock

    meta = str(tmp_path / "idx_meta")
    with _index_write_lock(meta):
        child = _spawn(_LOCK_CHILD, "acquire-expect-reject", meta)
        out, err = child.communicate(timeout=60)
        assert child.returncode == 0, (
            f"child rc={child.returncode}\n{out}\n{err}")
    # lock released: a fresh foreign acquire... would now need its own
    # process; the immediate re-acquire here pins release worked
    with _index_write_lock(meta):
        pass


def test_edges_build_rejected_while_foreign_process_holds_lock(
        spark, sf_dir, tmp_path):
    """The inverse direction: a FOREIGN process holds the artifact's
    write.lock (live pid, fresh mtime) — an edges_build in this process
    must surface ConcurrentIndexWriter, not break the live holder's lock."""
    from json_sql_database_storage_spark.llm.search import (
        ConcurrentIndexWriter,
    )
    from json_sql_database_storage_spark.operators.graph_edges import (
        _edge_paths, edges_build,
    )

    paths = _edge_paths(spark, "copurchase_edges_xproc")
    ready, go = str(tmp_path / "ready"), str(tmp_path / "go")
    child = _spawn(_LOCK_CHILD, "hold", paths["meta"], ready, go)
    try:
        _wait_file(ready, 60, child)
        with pytest.raises(ConcurrentIndexWriter):
            edges_build(spark, sf_dir, "copurchase_edges_xproc")
    finally:
        open(go, "w").close()
        try:
            child.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            child.kill()
    assert child.returncode == 0
    # holder exited cleanly: the build now proceeds
    edges_build(spark, sf_dir, "copurchase_edges_xproc")


def test_edges_for_outlives_foreign_lock_holder(spark, sf_dir, tmp_path):
    """edges_for's wait-and-retry against a FOREIGN process: a consumer
    arriving while another OS process holds write.lock must neither fail
    nor serve a stale head — it retries the build once the holder
    releases, and returns the fresh artifact."""
    import threading

    from json_sql_database_storage_spark.operators.graph_edges import (
        _edge_paths, copurchase_edges_plan, edges_for, edges_load,
    )

    paths = _edge_paths(spark, "copurchase_edges_xproc_wait")
    ready, go = str(tmp_path / "ready"), str(tmp_path / "go")
    child = _spawn(_LOCK_CHILD, "hold", paths["meta"], ready, go)
    result: dict = {}

    def consume():
        result["paths"] = edges_for(spark, sf_dir,
                                    "copurchase_edges_xproc_wait",
                                    wait_seconds=120.0)

    try:
        _wait_file(ready, 60, child)
        t = threading.Thread(target=consume)
        t.start()
        time.sleep(1.0)          # consumer is inside the wait loop now
        assert t.is_alive()      # neither failed nor returned stale
        open(go, "w").close()    # holder releases WITHOUT committing
        t.join(timeout=180)
        assert not t.is_alive()
    finally:
        open(go, "w").close()
        try:
            child.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            child.kill()
    assert result["paths"] == paths
    rows = sorted(tuple(r) for r in
                  edges_load(spark, result["paths"]).collect())
    assert rows == sorted(tuple(r) for r in
                          copurchase_edges_plan(spark, sf_dir).collect())


# Child payload for the family-commit race (r12 verdict next-round #6):
# three save_docs of two-table documents (root + one typed-array child)
# against the SAME family as the parent.  Explicit positive rowNums keep
# root keys deterministic; child keys are xxhash64-derived from (parent,
# slot, pos), so both writers' child rows are disjoint and the only
# contended state is the family manifest chain itself.
_FAMILY_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from json_sql_database_storage_spark.session import build_session
from json_sql_database_storage_spark.documents.fixtures import docs_df
from json_sql_database_storage_spark.documents.store import DocumentStore

base, ready, go = sys.argv[1], sys.argv[2], sys.argv[3]
off = int(sys.argv[4])
spark = build_session("xproc-family-child", cores=2)
store = DocumentStore(spark, base, n_buckets=4)
open(ready, "w").close()
deadline = time.time() + 120
while not os.path.exists(go):
    if time.time() > deadline:
        raise SystemExit("parent never signalled go")
    time.sleep(0.01)
for i in range(3):
    k = off + i
    store.save_docs(docs_df(spark, [
        {{"rowNum": k, "name": "c-%d" % i,
          "items": [{{"type": "it", "rowNum": -1, "size": k}},
                    {{"type": "it", "rowNum": -1, "size": k + 1}}]}},
    ]), "fam")
spark.stop()
"""


@pytest.mark.slow
def test_family_commit_cross_process_race_carries_forward_pins(
        spark, tmp_path):
    """Two OS processes save_docs the same two-table family concurrently
    (r12 verdict next-round #6).  _commit_family's rebase loop is the
    contended path: the loser must retry with pins ≥ the winner's (the
    regressive-pin guard) and carry forward child pins it didn't touch —
    verified by (1) every doc from BOTH writers readable through
    read_family at the head, (2) one family version per save_docs with
    no gaps, and (3) child pins monotonically non-decreasing across the
    whole manifest chain (a regressed pin anywhere = a torn family)."""
    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.model import KEY
    from json_sql_database_storage_spark.documents.store import DocumentStore

    base = str(tmp_path / "collections")
    ready, go = str(tmp_path / "ready"), str(tmp_path / "go")
    store = DocumentStore(spark, base, n_buckets=4)
    store.save_docs(docs_df(spark, [
        {"rowNum": 1, "name": "seed",
         "items": [{"type": "it", "rowNum": -1, "size": 0},
                   {"type": "it", "rowNum": -1, "size": 1}]},
    ]), "fam")                                              # family v0
    assert len(store.family_tables("fam")) >= 2
    child = _spawn(_FAMILY_CHILD, base, ready, go, "200")
    try:
        _wait_file(ready, 180, child)
        open(go, "w").close()
        for i in range(3):
            k = 100 + i
            store.save_docs(docs_df(spark, [
                {"rowNum": k, "name": f"p-{i}",
                 "items": [{"type": "it", "rowNum": -1, "size": k},
                           {"type": "it", "rowNum": -1, "size": k + 1}]},
            ]), "fam")
        out, err = child.communicate(timeout=300)
        assert child.returncode == 0, (
            f"child failed rc={child.returncode}\n{out}\n{err}")
    finally:
        if child.poll() is None:
            child.kill()

    # one family version per save_docs, no gaps: seed + 2 writers × 3
    assert store.family_version("fam") == 6
    # the head reads BOTH writers' docs — root and child alike (a loser
    # manifest that failed to rebase would pin child versions predating
    # the winner's rows and drop them here)
    root_keys = {r[KEY] for r in store.read_family("fam", "fam").collect()}
    assert root_keys == {1, 100, 101, 102, 200, 201, 202}
    child_tables = [t for t in store.family_tables("fam") if t != "fam"]
    assert len(child_tables) == 1
    child_rows = store.read_family("fam", child_tables[0]).collect()
    assert len(child_rows) == 7 * 2     # two items per doc, all disjoint
    # pins never regress anywhere in the chain — the family head (and
    # every intermediate manifest) moves strictly forward per table
    pins = [store.family_tables("fam", v) for v in range(7)]
    for a, b in zip(pins, pins[1:]):
        for t, v in a.items():
            assert b.get(t, v) >= v, (a, b)
