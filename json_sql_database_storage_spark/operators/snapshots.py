"""Snapshot / time-travel versioned table (SURVEY.md §2 b1.19, r5 addendum).

The reference is a *storage* engine (README.md:2 — put JSON where SQL can
reach it; DatabaseManager.java:130 auto-DDL) but has no history: an update
destroys the previous row.  This module adds the lakehouse primitive the
modern version of that contract needs — versioned snapshots with O(changed
partitions) commits and time-travel reads — built from plain parquet plus a
JSON manifest, the same copy-on-write idea as Delta/Iceberg commits:

  v0 commit   write the base table partitioned by year; manifest v0 lists
              each partition directory.
  v1 commit   a MERGE (updates + inserts) rewrites ONLY the partitions that
              contain changed keys; manifest v1 points at the rewritten
              directories for touched years and REUSES v0's directories for
              untouched years (physical sharing — pinned in
              tests/test_sources.py).
  read AS OF  group the manifest's directories by their commit base and
              issue one multi-path scan per base (≤ #commits scans, each
              partition-pruned), union — never one scan per partition.

Scale notes:
- The commit path's only driver-side work is O(changed partitions): the
  distinct-years collect (4 rows here; thousands at 100 TB — manifest-sized,
  exactly what Delta's commit protocol also holds in memory) and the
  manifest write.  Row data never touches the driver.
- The MERGE reads only the touched partitions of v0 (partition-pruned scan)
  plus the delta — O(delta + touched partitions), not O(table).
- Latest-row-wins uses the same anti-join + union shape as the SCD2/CDC
  family (operators/scd.py).

Money stays in integer cents (functions/exact.py convention) so both
engines sum exactly.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .scans import _sink

_CUT_INS = "1999-01-01 00:00:00"  # v0 = strictly before; inserts = this year
_CUT_END = "2000-01-01 00:00:00"
_UPD_YEAR = 1995  # updates touch ONLY this year — later v0 partitions must be reused


def _commit_dirs(data_dir: str) -> dict[int, str]:
    """Partition directories of one commit's partitionBy('o_year') write,
    keyed by year — the listing a real table format records at commit."""
    out: dict[int, str] = {}
    for entry in os.scandir(data_dir):
        if entry.is_dir() and entry.name.startswith("o_year="):
            val = entry.name.split("=", 1)[1]
            if not val.lstrip("-").isdigit():
                # a NULL o_year lands in __HIVE_DEFAULT_PARTITION__ —
                # fail with a partition-key message, not an int() parse
                # error (latent with TPC-H dates, real for other inputs)
                raise ValueError(
                    f"null partition key in {data_dir!r} "
                    f"({entry.name}): snapshot commits require non-null "
                    f"o_year")
            out[int(val)] = entry.path
    return out


def _write_log(root: str, manifests: dict) -> None:
    """Atomically (re)write the compacted manifest.json log: tmp + fsync
    + os.replace — a crash mid-write can no longer leave a TORN log that
    bricks every later load_manifests (the same discipline
    commit_manifest applies to the CAS entries)."""
    path = os.path.join(root, "manifest.json")
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump({str(v): m for v, m in manifests.items()}, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_version(spark: SparkSession, manifest: dict[int, str]) -> DataFrame:
    """Time-travel read: one partition-pruned multi-path scan per commit
    base the manifest references (NOT per partition), unioned.  Schema
    reconciliation is per-commit-base (r7.6): each base scan merges its own
    footers, and bases are unioned by NAME with missing columns as NULL —
    so a version whose later commits added a column reads older commits'
    partitions as NULL for it, and an AS-OF read of a pre-evolution
    version never sees the column at all."""
    by_base: dict[str, list[str]] = {}
    for path in manifest.values():
        by_base.setdefault(os.path.dirname(path), []).append(path)
    if not by_base:
        # a DELETE that doomed every partition commits an EMPTY manifest;
        # fail with the situation named instead of parts[0] IndexError
        raise ValueError(
            "manifest references no data directories (fully-deleted "
            "version) — read it through a schema-carrying store "
            "(DocumentStore.read_asof) or guard the call site")
    parts = [
        spark.read.option("basePath", base).option("mergeSchema", "true")
        .parquet(*sorted(paths))
        for base, paths in sorted(by_base.items())
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


def merge_cow(v0_rows: DataFrame, delta: DataFrame,
              allow_missing: bool = False) -> DataFrame:
    """Copy-on-write MERGE output for the touched partitions: surviving v0
    rows (key not replaced) + all delta rows.  Caller must pre-prune
    v0_rows to the touched partitions — this function never sees untouched
    data.  `allow_missing` admits a schema-evolving delta (new columns →
    NULL on the surviving v0 side)."""
    return (
        v0_rows.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(delta, allowMissingColumns=allow_missing)
    )


@register(
    "snapshot_time_travel",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_INS}'
), upd AS (
  SELECT o_orderkey, o_year, cents + 100 AS cents
  FROM base WHERE o_orderkey % 10 = 0 AND o_year = {_UPD_YEAR}
), ins AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CUT_INS}'
    AND o_orderdate <  TIMESTAMP '{_CUT_END}'
), delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
v1 AS (
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
  UNION ALL SELECT * FROM delta
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents FROM base
UNION ALL
SELECT 1 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents FROM v1
ORDER BY version
""",
    tags=("b1.19",),
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit v0, MERGE-commit v1 rewriting only touched partitions, then
    time-travel read BOTH versions and summarize each — proving the old
    snapshot is still fully readable after the new commit."""
    manifests = snapshot_commit(spark, sf_dir)
    outs = []
    for version, manifest in sorted(manifests.items()):
        outs.append(
            read_version(spark, manifest)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("total_cents"))
            .select(F.lit(version).alias("version"), "n_rows", "total_cents"))
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df.orderBy("version")


def snapshot_commit(spark: SparkSession, sf_dir: str,
                    name: str = "snapshot_tt",
                    root: str | None = None) -> dict[int, dict[int, str]]:
    """Write the v0 and v1 commits under the session sink (or an explicit
    `root`); return {version: {year: partition_dir}} manifests (also
    persisted as manifest.json next to the data, like a table format's
    log)."""
    root = _sink(name, spark) if root is None else root
    cut_ins = F.lit(_CUT_INS).cast("timestamp")
    cut_end = F.lit(_CUT_END).cast("timestamp")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))

    # ---- commit 0: full base write, partitioned by year
    base = o.filter(F.col("o_orderdate") < cut_ins).drop("o_orderdate")
    v0_data = os.path.join(root, "v0data")
    base.write.mode("overwrite").partitionBy("o_year").parquet(v0_data)
    m0 = _commit_dirs(v0_data)

    # ---- the MERGE delta: one year's updates (every 10th key) + the 1999 inserts
    v0 = read_version(spark, m0)
    upd = (v0.filter((F.col("o_orderkey") % 10 == 0)
                     & (F.col("o_year") == _UPD_YEAR))
           .withColumn("cents", F.col("cents") + 100))
    ins = (o.filter((F.col("o_orderdate") >= cut_ins)
                    & (F.col("o_orderdate") < cut_end)).drop("o_orderdate"))
    delta = upd.unionByName(ins)

    # ---- commit 1: rewrite ONLY partitions containing changed keys.
    # O(changed partitions) driver state — the manifest-sized collect every
    # table format's commit makes; row data stays distributed.
    touched = sorted(r["o_year"] for r in
                     delta.select("o_year").distinct().collect())
    v0_touched = v0.filter(F.col("o_year").isin(touched))
    merged = merge_cow(v0_touched, delta)
    v1_data = os.path.join(root, "v1data")
    merged.write.mode("overwrite").partitionBy("o_year").parquet(v1_data)
    m1_new = _commit_dirs(v1_data)
    m1 = {y: (m1_new[y] if y in m1_new else path) for y, path in m0.items()}
    m1.update({y: p for y, p in m1_new.items() if y not in m1})

    manifests = {0: m0, 1: m1}
    # claim each version in the put-if-absent CAS log (r6.7).  The claim is
    # attempted UNCONDITIONALLY — an os.path.exists pre-check would turn the
    # CAS into a lost-update race (r6 ADVICE item 1): whoever created the
    # file between the check and the create would win silently.  A conflict
    # is tolerated only when the existing file's CONTENT equals the manifest
    # being claimed (an idempotent re-run of this same commit); any other
    # content is a genuine concurrent writer and re-raises.  NOTE the
    # content-equality tolerance is exactly as strong as this exhibit's
    # setup: the root is SESSION-PRIVATE (_sink scopes by applicationId)
    # and the data paths/content are deterministic functions of the input,
    # so the only same-version claimant is a re-run of this very commit —
    # a genuinely different writer would produce different content and
    # re-raise.  (r10 review) The compacted log is written AFTER the
    # claims succeed: writing it first would let a LOSING writer clobber
    # the log with manifests the CAS never committed.
    for v, m in manifests.items():
        try:
            commit_manifest(root, v, m)
        except SnapshotConflict:
            if read_committed_manifest(root, v) != m:
                raise
    _write_log(root, manifests)
    return manifests


# ---------------------------------------------------------------------------
# r6.3 (b1.19b) — snapshot LIFECYCLE: retention/expiry + manifest
# compaction (r5 verdict next-round #4).  The two table-format operations a
# COW snapshot table needs once it runs for more than a day:
#
#   expire      keep the last N versions; physically delete every partition
#               directory referenced ONLY by expired versions.  Shared
#               directories (untouched partitions an old and a new manifest
#               both point at — the physical-sharing property pinned in
#               tests/test_sources.py) survive, so expiry never breaks a
#               retained version.  This is Delta VACUUM / Iceberg
#               expire_snapshots.
#   compact     rewrite the manifest log to a single file holding only the
#               surviving versions — an AS-OF read of an expired version
#               now fails FAST at manifest lookup (KeyError), not half-way
#               through a scan of deleted paths.
#
# Scale: expiry's working set is manifests (O(partitions) paths — the same
# driver-side metadata every table format's VACUUM holds), never row data;
# the deletions are per-directory filesystem ops an object store runs as
# bulk deletes.
# ---------------------------------------------------------------------------


def expire_snapshots(root: str, manifests: dict[int, dict[int, str]],
                     keep_last: int) -> dict:
    """Delete exactly the partition directories no retained version
    references; compact the manifest log to the survivors.  Returns
    {kept_versions, deleted_dirs, kept_dirs}.

    Ordering is metadata-first (r6 ADVICE item 2): the compacted manifest
    log and the retired CAS entries are written BEFORE any data directory
    is removed, so a crash mid-expiry leaves either (a) the old log with
    all data intact, or (b) the new log whose every referenced path still
    exists — never a log resolving expired versions to deleted paths.
    Every deletion target is also confined to `root` (a manifest poisoned
    with an outside path raises instead of rmtree-ing it)."""
    import shutil

    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}): versions[-0:] "
            f"would silently retain EVERYTHING, the opposite of the ask")
    versions = sorted(manifests)
    keep = versions[-keep_last:]
    kept_dirs = {p for v in keep for p in manifests[v].values()}
    expired_dirs = {p for v in versions if v not in keep
                    for p in manifests[v].values()}
    to_delete = sorted(expired_dirs - kept_dirs)
    real_root = os.path.realpath(root)
    for p in to_delete:
        rp = os.path.realpath(p)
        # STRICT descendant: commonpath == root also holds when the
        # poisoned path IS the root — rmtree(root) would delete kept
        # data, the log, and the surviving CAS entries
        if os.path.commonpath([real_root, rp]) != real_root \
                or rp == real_root:
            raise ValueError(f"refusing to delete {p!r}: outside {root!r}")
    # metadata first: compact the log, raise the claim floor, retire
    # expired CAS entries …
    _write_log(root, {v: manifests[v] for v in keep})
    set_version_floor(root, min(keep))
    for v in versions:
        if v not in keep:
            vpath = os.path.join(root, f"manifest-v{v}.json")
            if os.path.exists(vpath):
                os.remove(vpath)
    # … then delete the now-unreferenced data
    for p in to_delete:
        shutil.rmtree(p)
    return {"kept_versions": keep, "deleted_dirs": to_delete,
            "kept_dirs": sorted(kept_dirs)}


def load_manifests(root: str) -> dict[int, dict[int, str]]:
    """Read the (possibly compacted) manifest log back; AS-OF resolution
    raises KeyError for an expired version."""
    with open(os.path.join(root, "manifest.json")) as f:
        raw = json.load(f)
    return {int(v): {int(y): p for y, p in m.items()} for v, m in raw.items()}


@register(
    "snapshot_expire",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_INS}'
), upd AS (
  SELECT o_orderkey, o_year, cents + 100 AS cents
  FROM base WHERE o_orderkey % 10 = 0 AND o_year = {_UPD_YEAR}
), ins AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CUT_INS}'
    AND o_orderdate <  TIMESTAMP '{_CUT_END}'
), delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
v1 AS (
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
  UNION ALL SELECT * FROM delta
)
SELECT 1 AS version,
       count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       -- a v0 dir dies iff its year was rewritten by the MERGE: distinct
       -- delta-touched years INTERSECTED with v0's years (delta years with
       -- no v0 partition — pure-insert years — created a new dir, deleted
       -- nothing).  Relational, so it stays correct if _UPD_YEAR/_CUT_INS
       -- move (r6 ADVICE item 3).
       (SELECT CAST(count(DISTINCT d.o_year) AS BIGINT) FROM delta d
        WHERE d.o_year IN (SELECT o_year FROM base))
         AS n_dirs_deleted,
       (SELECT CAST(count(DISTINCT o_year) AS BIGINT) FROM v1)
         AS n_dirs_kept
FROM v1
""",
    tags=("r6.3", "b1.19"),
)
def snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit v0 + v1, expire to keep_last=1, then read the SURVIVING
    version through the compacted manifest and summarize it alongside the
    physical-deletion counts.  Deleted = exactly the v0 partition dirs the
    v1 MERGE rewrote (shared untouched dirs survive); the oracle derives
    the same counts relationally: dirs deleted = distinct update-touched
    years that existed in v0, dirs kept = distinct years in v1."""
    # fresh root per invocation (r10): expiry raises the CAS claim floor,
    # so a deterministic RE-RUN on the same root would try to re-claim
    # the retired v0 and be refused — exactly the resurrect protection
    # working as designed; the exhibit therefore commits into its own dir
    # each time (output unchanged: the counts are input-deterministic)
    import tempfile

    base = _sink("snapshot_exp", spark)
    os.makedirs(base, exist_ok=True)
    root = tempfile.mkdtemp(dir=base)
    manifests = snapshot_commit(spark, sf_dir, root=root)
    info = expire_snapshots(root, manifests, keep_last=1)
    survivor = load_manifests(root)[1]
    return (
        read_version(spark, survivor)
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("cents").cast("bigint").alias("total_cents"))
        .select(F.lit(1).alias("version"), "n_rows", "total_cents",
                F.lit(len(info["deleted_dirs"])).cast("bigint")
                 .alias("n_dirs_deleted"),
                F.lit(len(info["kept_dirs"])).cast("bigint")
                 .alias("n_dirs_kept"))
    )


# ---------------------------------------------------------------------------
# r6.7 — concurrent-commit CONFLICT DETECTION (the last lifecycle gap the
# r5 verdict named for b1.19): optimistic concurrency through put-if-absent
# version files, the primitive every log-structured table format builds on
# (Delta's `N.json` put-if-absent; Iceberg's atomic metadata swap).  A
# writer prepares its data files freely (they are invisible until
# committed), then claims version N by CREATING `manifest-vN.json` with
# O_EXCL — the filesystem/object-store arbitrates: exactly one writer's
# create succeeds, the loser gets SnapshotConflict and must rebase (re-read
# the new current version, re-apply its delta, retry at N+1).  The loser's
# orphaned data files are exactly what expire/VACUUM sweeps.
# ---------------------------------------------------------------------------


class SnapshotConflict(Exception):
    """Another writer already committed this version — rebase and retry."""


def commit_manifest(root: str, version: int, manifest: dict[int, str]) -> str:
    """Atomically claim `version` for `manifest`.  Raises SnapshotConflict
    if the version is already claimed.

    Write-then-link, not create-then-write (r7 ADVICE item 2): the old
    O_EXCL-create + json.dump left a crash window in which an EMPTY
    manifest-vN.json existed — current_version() then counted N as
    committed and every later read died parsing it, bricking the table.
    Now the full content is written and fsync'd to a hidden temp file
    first, and the version is claimed by os.link(tmp, path) — one atomic,
    exclusive metadata operation (link(2) fails with EEXIST if the name is
    taken).  A crash before the link leaves only the dot-prefixed temp
    file, which current_version()'s ``manifest-v*`` match never counts;
    a crash after the link has already published complete, durable
    content.  This is the same swap discipline as Delta's ``N.json``
    put-if-absent commit."""
    # (r10 review) a claim below the EXPIRY FLOOR is rejected: vacuum /
    # expire_snapshots delete retired versions' CAS files, which would
    # otherwise REOPEN those version numbers — a lagging writer that
    # pinned its target before the expiry could then publish a second,
    # different "version N" into a log whose history already passed it.
    # The floor preserves the exactly-one-writer-wins-version-N invariant
    # across GC (real formats keep or checkpoint past retired log entries
    # for the same reason).
    floor = version_floor(root)
    if version < floor:
        raise SnapshotConflict(
            f"version {version} is below the expiry floor {floor} under "
            f"{root} — that version number was retired by vacuum/expiry")
    path = os.path.join(root, f"manifest-v{version}.json")
    tmp = os.path.join(root, f".manifest-v{version}.{os.getpid()}."
                             f"{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump({str(y): p for y, p in manifest.items()}, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise SnapshotConflict(
            f"version {version} already committed under {root}") from None
    finally:
        os.unlink(tmp)
    # fsync the DIRECTORY so the new entry itself is durable: without it
    # a power loss right after the link can lose the dirent — the writer
    # observed a successful commit that a restart no longer sees
    try:
        dfd = os.open(root, os.O_DIRECTORY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass    # platforms without O_DIRECTORY keep the old guarantee
    return path


_FLOOR_FILE = "_version_floor"


def version_floor(root: str) -> int:
    """Lowest version number still claimable under `root` (0 when no
    expiry has ever run)."""
    try:
        with open(os.path.join(root, _FLOOR_FILE)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


def set_version_floor(root: str, floor: int) -> None:
    """Record (monotonically) the lowest retained version after an
    expiry/vacuum — see commit_manifest's floor check.  Atomic replace;
    never lowers an existing floor."""
    cur = version_floor(root)
    if floor <= cur:
        return
    path = os.path.join(root, _FLOOR_FILE)
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        f.write(str(floor))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def vacuum_artifact_segments(meta_dir: str, data_roots: dict[str, str],
                             keep_last: int, live_segs_of) -> list[str]:
    """Shared GC core for SEGMENTED artifacts (the BM25/IVFPQ indexes and
    the graph edge artifact — r11 review: three near-verbatim copies of
    this protocol drifted apart once already): expire manifests below the
    keep window METADATA-FIRST (set the version floor before any delete,
    so expired version numbers can never be re-claimed by a lagging
    writer), then sweep every ``seg=N`` dir under ``data_roots`` that no
    retained manifest references.  Returns deleted dirs.

    ``live_segs_of(version)`` returns {data_roots key: set of live seg
    ids} for one retained manifest, raising FileNotFoundError if that
    version was already expired (an expired version pins nothing — the
    idempotence contract: repeated vacuums are no-ops for the reclaimed
    range).

    CALLER HOLDS THE ARTIFACT'S write.lock: vacuum mutates shared
    segment space, so racing an in-flight writer it could sweep the
    writer's freshly written but not-yet-committed seg dir right before
    the CAS publishes a manifest pointing at it — silent row loss."""
    import contextlib
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1 (got {keep_last})")
    head = current_version(meta_dir)
    keep = list(range(max(0, head - keep_last + 1), head + 1))
    if keep:
        set_version_floor(meta_dir, min(keep))
    live: dict[str, set[int]] = {k: set() for k in data_roots}
    for v in keep:
        try:
            for key, segs in live_segs_of(v).items():
                live[key] |= {int(s) for s in segs}
        except FileNotFoundError:
            continue
    for v in range(head - keep_last, -1, -1):
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(meta_dir, f"manifest-v{v}.json"))
    deleted = []
    for key, segs in live.items():
        root = data_roots[key]
        if not os.path.isdir(root):
            continue
        for entry in os.scandir(root):
            if (entry.is_dir() and entry.name.startswith("seg=")
                    and int(entry.name.split("=", 1)[1]) not in segs):
                shutil.rmtree(entry.path)
                deleted.append(entry.path)
    return deleted


def read_committed_manifest(root: str, version: int) -> dict[int, str]:
    """The partition listing a prior commit_manifest claimed for `version`
    — what a conflicted writer compares its own manifest against to decide
    idempotent-re-run vs genuine concurrent commit."""
    with open(os.path.join(root, f"manifest-v{version}.json")) as f:
        return {int(y): p for y, p in json.load(f).items()}


def current_version(root: str) -> int:
    """Highest committed version in the CAS log (-1 if none) — what a
    conflicted writer re-reads before rebasing."""
    vs = [-1]
    for entry in os.scandir(root):
        name = entry.name
        if name.startswith("manifest-v") and name.endswith(".json"):
            vs.append(int(name[len("manifest-v"):-len(".json")]))
    return max(vs)


# ---------------------------------------------------------------------------
# r7.6 (b1.19c) — snapshot SCHEMA EVOLUTION (r6 verdict next-round #6): a
# v1 commit whose delta carries a NEW column.  The commit machinery is
# unchanged — the rewritten partitions simply have the wider schema and the
# untouched v0 directories are reused as-is; reconciliation happens at
# read time, per commit base (read_version: mergeSchema within a base,
# unionByName(allowMissingColumns) across bases).  The contract exhibited:
#   AS-OF v0  the column does not exist at all (history is immutable —
#             old snapshots don't grow columns retroactively);
#   AS-OF v1  rows from rewritten partitions carry the column, rows read
#             from reused v0 directories read it as NULL (no back-fill —
#             the same lazy-evolution semantics as Delta/Iceberg ADD
#             COLUMN, and as the reference's auto-DDL, which also leaves
#             existing rows untouched: DatabaseManager.java:130,152).
# ---------------------------------------------------------------------------


@register(
    "snapshot_schema_evolution",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_INS}'
), upd AS (
  SELECT o_orderkey, o_year, cents + 100 AS cents, 'merged' AS o_flag
  FROM base WHERE o_orderkey % 10 = 0 AND o_year = {_UPD_YEAR}
), ins AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         'merged' AS o_flag
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CUT_INS}'
    AND o_orderdate <  TIMESTAMP '{_CUT_END}'
), delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
v1 AS (
  SELECT b.o_orderkey, b.o_year, b.cents, CAST(NULL AS VARCHAR) AS o_flag
  FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
  UNION ALL SELECT * FROM delta
)
SELECT 0 AS version, CAST(0 AS BIGINT) AS has_flag_col,
       count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(0 AS BIGINT) AS n_flagged
FROM base
UNION ALL
SELECT 1 AS version, CAST(1 AS BIGINT) AS has_flag_col,
       count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(count(o_flag) AS BIGINT) AS n_flagged
FROM v1
ORDER BY version
""",
    tags=("r7.6", "b1.19"),
)
def snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit v0, then a v1 MERGE whose delta ADDS o_flag; AS-OF read both
    versions: v0 has no such column, v1 reads reused v0 partitions as NULL
    and rewritten/inserted rows as 'merged'."""
    root = _sink("snapshot_sev", spark)
    cut_ins = F.lit(_CUT_INS).cast("timestamp")
    cut_end = F.lit(_CUT_END).cast("timestamp")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))

    base = o.filter(F.col("o_orderdate") < cut_ins).drop("o_orderdate")
    v0_data = os.path.join(root, "v0data")
    base.write.mode("overwrite").partitionBy("o_year").parquet(v0_data)
    m0 = _commit_dirs(v0_data)

    v0 = read_version(spark, m0)
    upd = (v0.filter((F.col("o_orderkey") % 10 == 0)
                     & (F.col("o_year") == _UPD_YEAR))
           .withColumn("cents", F.col("cents") + 100)
           .withColumn("o_flag", F.lit("merged")))
    ins = (o.filter((F.col("o_orderdate") >= cut_ins)
                    & (F.col("o_orderdate") < cut_end)).drop("o_orderdate")
           .withColumn("o_flag", F.lit("merged")))
    delta = upd.unionByName(ins)

    touched = sorted(r["o_year"] for r in
                     delta.select("o_year").distinct().collect())
    merged = merge_cow(v0.filter(F.col("o_year").isin(touched)), delta,
                       allow_missing=True)
    v1_data = os.path.join(root, "v1data")
    merged.write.mode("overwrite").partitionBy("o_year").parquet(v1_data)
    m1_new = _commit_dirs(v1_data)
    m1 = {y: (m1_new[y] if y in m1_new else path) for y, path in m0.items()}
    m1.update({y: p for y, p in m1_new.items() if y not in m1})
    for v, m in ((0, m0), (1, m1)):
        try:
            commit_manifest(root, v, m)
        except SnapshotConflict:
            if read_committed_manifest(root, v) != m:
                raise

    outs = []
    for version, manifest in ((0, m0), (1, m1)):
        df = read_version(spark, manifest)
        has_flag = "o_flag" in df.columns
        n_flagged = (F.count("o_flag").cast("bigint") if has_flag
                     else F.lit(0).cast("bigint"))
        outs.append(
            df.agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum("cents").cast("bigint").alias("total_cents"),
                   n_flagged.alias("n_flagged"))
            .select(F.lit(version).alias("version"),
                    F.lit(1 if has_flag else 0).cast("bigint")
                     .alias("has_flag_col"),
                    "n_rows", "total_cents", "n_flagged"))
    return outs[0].unionByName(outs[1]).orderBy("version")


# ---------------------------------------------------------------------------
# r7.11 (b1.19d) — DELETE as a copy-on-write commit: the remaining CRUD
# verb (time-travel covers read, the MERGE covers update+insert, expiry
# covers retention).  DELETE FROM t WHERE <pred> rewrites ONLY the
# partitions containing doomed keys — surviving rows are rewritten, the
# doomed rows simply don't appear, untouched directories are reused — and
# the old version stays fully readable (the deleted rows still exist in
# v0's files; expire is what eventually reclaims them).  A partition whose
# every row dies produces NO rewritten directory and is dropped from the
# manifest, not resurrected from v0.
# ---------------------------------------------------------------------------

_DEL_YEAR = 1996
_DEL_MOD = 7


def build_delete_versions(spark: SparkSession, sf_dir: str,
                          root: str) -> tuple[dict, dict]:
    """The base-write / DELETE-rewrite recipe shared by snapshot_delete
    and snapshot_rollback (operators/staged_r9.py): write base as v0,
    rewrite ONLY the doomed years' partitions as v1 (untouched dirs
    reused; a fully-dead partition vanishes from the manifest), return
    (m0, m1) UNCOMMITTED — callers commit via commit_version_manifests
    so the two exhibits can never diverge on the rewrite edge cases."""
    cut_ins = F.lit(_CUT_INS).cast("timestamp")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    base = o.filter(F.col("o_orderdate") < cut_ins).drop("o_orderdate")
    v0_data = os.path.join(root, "v0data")
    base.write.mode("overwrite").partitionBy("o_year").parquet(v0_data)
    m0 = _commit_dirs(v0_data)

    v0 = read_version(spark, m0)
    doomed = (v0.filter((F.col("o_year") == _DEL_YEAR)
                        & (F.col("o_orderkey") % _DEL_MOD == 0))
              .select("o_orderkey", "o_year"))
    # O(touched partitions) driver metadata, as in the MERGE commit
    touched = sorted(r["o_year"] for r in
                     doomed.select("o_year").distinct().collect())
    survivors = (v0.filter(F.col("o_year").isin(touched))
                 .join(doomed.select("o_orderkey"), "o_orderkey",
                       "left_anti"))
    v1_data = os.path.join(root, "v1data")
    survivors.write.mode("overwrite").partitionBy("o_year").parquet(v1_data)
    m1_new = _commit_dirs(v1_data)
    # untouched years reuse v0 dirs; touched years point at the rewrite —
    # or vanish entirely when every row of the partition died
    m1 = {y: p for y, p in m0.items() if y not in touched}
    m1.update(m1_new)
    return m0, m1


def commit_version_manifests(root: str, pairs) -> None:
    """Idempotent-re-run commit loop: a conflict on an identical manifest
    is a no-op (the session-private-root determinism contract); a
    conflict on DIFFERENT content raises."""
    for v, m in pairs:
        try:
            commit_manifest(root, v, m)
        except SnapshotConflict:
            if read_committed_manifest(root, v) != m:
                raise


def version_aggregates(spark: SparkSession, pairs) -> DataFrame:
    """(version, n_rows, total_cents) per committed manifest — the
    read-back every snapshot exhibit reports."""
    outs = []
    for version, manifest in pairs:
        outs.append(
            read_version(spark, manifest)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("total_cents"))
            .select(F.lit(version).alias("version"), "n_rows",
                    "total_cents"))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out.orderBy("version")


def delete_versions_sql(extra_versions: str = "") -> str:
    """Oracle twin of build_delete_versions: v0/v1 content as CTEs plus
    one row per version; callers append extra UNION branches (the
    rollback's v2 ≡ base)."""
    return f"""
WITH base AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_INS}'
), doomed AS (
  SELECT o_orderkey FROM base
  WHERE o_year = {_DEL_YEAR} AND o_orderkey % {_DEL_MOD} = 0
), v1 AS (
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM doomed d
                    WHERE d.o_orderkey = b.o_orderkey)
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents FROM base
UNION ALL
SELECT 1 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents FROM v1
{extra_versions}ORDER BY version
"""


@register(
    "snapshot_delete",
    oracle=delete_versions_sql(),
    tags=("r7.11", "b1.19"),
)
def snapshot_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit v0, DELETE-commit v1 (every {_DEL_MOD}th key of one year)
    rewriting only that year's partition, then AS-OF read both versions —
    the deleted rows are gone at v1 and still present at v0."""
    root = _sink("snapshot_del", spark)
    m0, m1 = build_delete_versions(spark, sf_dir, root)
    commit_version_manifests(root, ((0, m0), (1, m1)))
    return version_aggregates(spark, ((0, m0), (1, m1)))
