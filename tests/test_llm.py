"""Functional assertions for the LLM-pipeline operators: the dedup queries
must actually FIND the planted duplicates, lang-id must beat chance on the
labeled corpus, and cosine math must agree with numpy."""

from __future__ import annotations

import os

import numpy as np
import pytest

from json_sql_database_storage_spark import registry

registry.load_all()
_SPECS = registry.specs()


def test_dedup_exact_removes_planted_copies(spark, sf_dir):
    out = _SPECS["dedup_exact"].fn(spark, sf_dir).collect()
    # corpus = 500 (sf0.001) docs + 30 exact copies + 30 near copies →
    # 530 distinct hashes; the 30 planted copies collapse
    n_docs = 500
    assert len(out) == n_docs + 30
    dup_groups = [r for r in out if r["n_copies"] == 2]
    assert len(dup_groups) == 30
    assert all(r["doc_id"] < 30 for r in dup_groups)  # survivor = min id


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    pairs = _SPECS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # every exact copy pair (id, id+100000) must collide in all bands
    exact_expected = {(i, i + 100000) for i in range(30)}
    assert exact_expected <= found
    # near copies (one appended token, jaccard ≈ n/(n+1) ≥ 0.8): most found
    near_found = {p for p in found if p[1] >= 200000 and p[0] == p[1] - 200000}
    assert len(near_found) >= 25
    # no false positives below the jaccard threshold
    assert all(r["jaccard"] >= 0.8 for r in pairs)


def test_cc_survivors_collapse_planted_clusters(spark, sf_dir):
    """Every planted copy (id+100000 exact, id+200000 near) must land in a
    cluster whose survivor is the ORIGINAL doc id (min id wins), and no
    planted copy may itself be a survivor."""
    import json

    out = _SPECS["dedup_cc_survivors"].fn(spark, sf_dir).collect()
    survivor_of = {}
    for r in out:
        for m in json.loads(r["members"]):      # members is a JSON string
            survivor_of[m] = r["survivor_id"]
    for base in range(30):                      # exact copies
        assert survivor_of.get(base + 100000, base) <= base
    assert all(s < 100000 for s in (r["survivor_id"] for r in out))
    assert all(r["n_members"] == len(json.loads(r["members"])) >= 2
               for r in out)


def test_simhash_finds_planted_dups(spark, sf_dir):
    from json_sql_database_storage_spark.llm.dedup import simhash_pairs
    pairs = simhash_pairs(spark, sf_dir).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    exact_expected = {(i, i + 100000) for i in range(30)}
    assert exact_expected <= found
    exact_pairs = [r for r in pairs if (r["id_a"], r["id_b"]) in exact_expected]
    assert all(r["hamming"] == 0 for r in exact_pairs)


def test_lang_id_beats_chance(spark, sf_dir):
    out = _SPECS["text_lang_id"].fn(spark, sf_dir).collect()
    known = [r for r in out if r["predicted_lang"] != "unknown"]
    if not known:   # word-soup corpus may contain no marker tokens at all
        pytest.skip("no marker hits in synthetic corpus")
    acc = sum(r["lang"] == r["predicted_lang"] for r in known) / len(known)
    assert acc > 1 / 5  # better than uniform guess over 5 langs


def test_cosine_matches_numpy(spark, sf_dir):
    out = _SPECS["sim_cosine_topk"].fn(spark, sf_dir)
    rows = out.filter("query_id = 0").collect()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in _SPECS and
           spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    q = emb[0]
    sims = {vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in emb.items() if vid != 0}
    expected_top = sorted(sims, key=lambda k: (-sims[k], k))[:5]
    got_top = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert got_top == expected_top
    for r in rows:
        assert sims[r["neighbor_id"]] == pytest.approx(r["cos_sim"], abs=1e-9)


def test_nearest_centroid_mostly_pure(spark, sf_dir):
    out = _SPECS["sim_nearest_centroid"].fn(spark, sf_dir).collect()
    total = sum(r["n_vectors"] for r in out)
    matching = sum(r["n_matching_label"] for r in out)
    assert total == 500
    # synthetic labels are weakly clustered: per-label centroids recover
    # ~37% (numpy ceiling on this data) vs 10% chance over 10 labels
    assert matching / total > 0.25


def test_mm_decode_stub_raises():
    import pandas as pd
    from json_sql_database_storage_spark.llm.multimodal import decode_image_batch
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"xx"]), real=True)
    out = decode_image_batch(pd.Series([b"12345678abc"]))
    assert list(out.columns) == ["n_bytes", "checksum"]
    assert out["n_bytes"][0] == 11


def test_mm_resize_stub():
    import pandas as pd
    from json_sql_database_storage_spark.llm.multimodal import resize_batch
    pdf = pd.DataFrame({
        "doc_id": [1], "payload": [b"\x00" * 64],
        "meta": [{"width": 256, "height": 128}]})
    with pytest.raises(NotImplementedError):
        resize_batch(pdf, real=True)
    out = resize_batch(pdf)
    # 256x128 capped to max dim 128 preserving aspect -> 128x64
    assert (int(out["new_width"][0]), int(out["new_height"][0])) == (128, 64)


def test_mm_frame_sample_stub():
    import pandas as pd
    from json_sql_database_storage_spark.llm.multimodal import (
        sample_frames_batch)
    payload = bytes(range(64))
    pdf = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    with pytest.raises(NotImplementedError):
        sample_frames_batch(pdf, real=True)
    out = sample_frames_batch(pdf)
    assert list(out["frame_idx"]) == [0, 3, 6]
    assert out["frame_checksum"][1] == int.from_bytes(
        payload[24:32], "big", signed=True)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF (single-probe, per-label cells) must recover a reasonable share
    of the brute-force top-5 — on weakly-clustered data, well above the
    ~10% expectation of a random cell assignment."""
    brute = _SPECS["sim_cosine_topk"].fn(spark, sf_dir).collect()
    ivf = _SPECS["sim_ivf_topk"].fn(spark, sf_dir).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(brute_sets[q] & ivf_sets.get(q, set())) / len(brute_sets[q])
               for q in brute_sets]
    assert sum(recalls) / len(recalls) > 0.2


def test_lsh_bucket_cap_bounds_hot_buckets(spark, sf_dir):
    """A band-bucket larger than _BUCKET_CAP must emit linear star pairs
    (min-id ↔ rest), not a quadratic pair explosion; a normal bucket must
    emit all pairs.  Also asserts the real corpus never hits the cap, which
    is what keeps the oracle exact."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm import dedup as D

    n_hot = D._BUCKET_CAP + 200
    # identical signatures → every doc lands in the same bucket in all bands
    sig = list(range(D._NUM_HASHES))
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit(sig).cast("array<bigint>").alias("sig"))
    pairs = D.lsh_candidate_pairs(hot).collect()
    assert len(pairs) == n_hot - 1            # star, not (n choose 2)
    assert all(r["id_a"] == 0 for r in pairs)  # all anchored at the min id

    small = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit(sig).cast("array<bigint>").alias("sig"))
    assert len(D.lsh_candidate_pairs(small).collect()) == 10  # full 5C2

    # real corpus: largest band-bucket far below the cap
    docs = D._corpus_with_dups(spark, sf_dir)
    staged = docs.select(
        "doc_id",
        D._hashed_shingles_of(F.split(F.lower("text"), r"\s+")).alias("sh"))
    sigs = staged.select(
        "doc_id",
        D.minhash_signature_udf(F.col("sh")).alias("sig"))
    bands = D.band_rows(sigs)
    biggest = (bands.groupBy("band_idx", "band_hash").count()
               .agg(F.max("count")).collect()[0][0])
    assert biggest <= D._BUCKET_CAP // 4


def test_kmeans_is_a_partition_and_improves(spark, sf_dir):
    """Every vector lands in exactly one of the k seed-derived clusters,
    and the second Lloyd iteration does not increase total within-cluster
    squared distance (the monotonic-improvement property that makes
    Lloyd's algorithm an algorithm and not a shuffle)."""
    import json

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm import clustering as C
    from json_sql_database_storage_spark.sources import load_table

    out = C.sim_kmeans(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    members = [m for r in out for m in json.loads(r["members"])]
    assert len(members) == n_total and len(set(members)) == n_total
    assert sum(r["n_vectors"] for r in out) == n_total
    assert {r["cluster"] for r in out} <= set(range(C._K))

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", C.as_double(F.col("embedding")).alias("e"))
    cent0 = (v.filter(F.col("vec_id") < C._K)
             .select(F.col("vec_id").alias("c_id"), F.col("e").alias("ce")))
    a1 = C._assign(v, cent0)
    cent1 = C._recenter(a1)
    a2 = C._assign(v, cent1)

    def sse(assigned, cents):
        joined = assigned.join(
            cents.withColumnRenamed("c_id", "cluster"), "cluster")
        return joined.select(
            F.sum(C._l2sq(F.col("e"), F.col("ce"))).alias("s")).first()["s"]

    # iteration-2 assignment against cent1 cannot be worse than iteration-1
    # assignment against cent1 (each vector independently picked its argmin)
    assert sse(a2, cent1) <= sse(a1, cent1) + 1e-9


def test_kmeans_deep_checkpoint_matches_unrolled(spark, sf_dir):
    """r7: the checkpointed driver-loop Lloyd (production path past the
    unrolled-plan depth ceiling) assigns IDENTICALLY to the single-plan
    form — a localCheckpoint truncates lineage, never changes values —
    and its iters=2 slice reproduces the registered sim_kmeans
    memberships exactly."""
    import json

    from json_sql_database_storage_spark.llm import clustering as C

    deep = C.kmeans_assignments(spark, sf_dir, iters=5, checkpoint_every=2)
    unrolled = C.kmeans_assignments(spark, sf_dir, iters=5,
                                    checkpoint_every=None)
    d = {r["vec_id"]: r["cluster"] for r in deep.collect()}
    u = {r["vec_id"]: r["cluster"] for r in unrolled.collect()}
    assert d == u and len(d) > 0

    two = {r["vec_id"]: r["cluster"]
           for r in C.kmeans_assignments(spark, sf_dir, iters=2).collect()}
    reg = {m: r["cluster"] for r in C.sim_kmeans(spark, sf_dir).collect()
           for m in json.loads(r["members"])}
    assert two == reg


def test_semdedup_keep_rule(spark, sf_dir):
    """keep=0 exactly when a lower-id vector in the SAME cluster is
    cosine-similar above τ — recompute the rule in pandas and compare."""
    import numpy as np

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm import clustering as C
    from json_sql_database_storage_spark.sources import load_table

    out = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in C.sim_semdedup(spark, sf_dir).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding").collect()}
    by_cluster: dict[int, list[int]] = {}
    for vid, (cl, _) in sorted(out.items()):
        by_cluster.setdefault(cl, []).append(vid)
    dropped = 0
    for cl, ids in by_cluster.items():
        for i, vid in enumerate(ids):
            expect_keep = 1
            for prev in ids[:i]:
                a, b = vecs[vid], vecs[prev]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= C._SEM_TAU:
                    expect_keep = 0
                    break
            assert out[vid][1] == expect_keep, vid
            dropped += 1 - expect_keep
    assert dropped > 0  # the corpus contains semantic near-dups to prune


def test_repetition_quality_fractions_consistent(spark, sf_dir):
    """Fractions are internally consistent and the keep verdict equals the
    thresholds applied to the emitted fractions; the rule splits the corpus
    (some kept, some dropped) rather than degenerating to all-pass."""
    from json_sql_database_storage_spark.llm.text_analysis import (
        text_repetition_quality)

    rows = text_repetition_quality(spark, sf_dir).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert 0 < r["top_token_frac"] <= 1
        assert 0 <= r["top_bigram_frac"] <= 1
        assert 0 < r["distinct_ratio"] <= 1
        expect = int(r["top_token_frac"] <= 0.12
                     and r["top_bigram_frac"] <= 0.08
                     and r["distinct_ratio"] >= 0.45)
        assert r["keep"] == expect


def test_url_dedup_groups_are_real_duplicates(spark, sf_dir):
    """Members of a canonical-URL group must agree on (source, doc_id mod
    140) — i.e. the canonicalizer collapses exactly the planted variants,
    never unrelated URLs — and the survivor is the group's min doc_id."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.dedup import dedup_url
    from json_sql_database_storage_spark.sources import load_table

    out = dedup_url(spark, sf_dir).collect()
    assert out
    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in out:
        # canon_url = src{k}.example.com/page/{m} with k = m % 20
        host, _, path = r["canon_url"].partition(".example.com/page/")
        k, m = int(host.removeprefix("src")), int(path)
        assert k == m % 20
        group = [d for d in range(n_docs) if d % 140 == m]
        assert r["n_docs"] == len(group)
        assert r["survivor_id"] == min(group)


def test_multimodal_real_codec_paths_when_libs_present():
    """Runs the real=True codec integration points whenever the
    environment has the libraries (skips otherwise) — so the day the
    sandbox gains PIL/cv2, these paths stop being dead code without
    anyone editing a test.  Pure pandas-level check (no Spark needed):
    the mapInPandas plumbing around these functions is already covered by
    the mm_* oracle queries."""
    import pandas as pd

    from json_sql_database_storage_spark.llm.multimodal import (
        decode_image_batch, resize_batch)

    Image = pytest.importorskip("PIL.Image", reason="PIL not installed")
    import io

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    payloads = pd.Series([png_bytes(200, 100, (10, 20, 30)),
                          png_bytes(64, 64, (1, 2, 3))])
    feats = decode_image_batch(payloads, real=True)
    assert list(feats["width"]) == [200, 64]
    assert list(feats["height"]) == [100, 64]
    assert list(feats["n_bytes"]) == [len(p) for p in payloads]
    # solid color → first 8 raw RGB bytes are the color repeated
    first8 = bytes([10, 20, 30, 10, 20, 30, 10, 20])
    assert feats["checksum"][0] == int.from_bytes(first8, "big", signed=True)

    pdf = pd.DataFrame({
        "doc_id": pd.Series([0, 1], dtype="int64"),
        "payload": payloads,
        "meta": [{"width": 200, "height": 100}, {"width": 64, "height": 64}],
    })
    rs = resize_batch(pdf, real=True)
    # 200×100 capped to max-dim 128 aspect-preserving → 128×64; 64×64 kept
    assert list(rs["new_width"]) == [128, 64]
    assert list(rs["new_height"]) == [64, 64]
    assert rs["resized_checksum"].dtype == "int64"


def test_multimodal_real_frame_sampling_when_cv2_present():
    import pandas as pd

    from json_sql_database_storage_spark.llm.multimodal import (
        sample_frames_batch)

    cv2 = pytest.importorskip("cv2", reason="OpenCV not installed")
    np_ = pytest.importorskip("numpy")
    import os
    import tempfile

    # author a tiny 7-frame mp4 with cv2 itself, then sample every 3rd
    fd, path = tempfile.mkstemp(suffix=".mp4")
    os.close(fd)
    try:
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             5, (16, 16))
        for i in range(7):
            wr.write(np_.full((16, 16, 3), i * 30, dtype=np_.uint8))
        wr.release()
        with open(path, "rb") as f:
            payload = f.read()
    finally:
        os.unlink(path)
    pdf = pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"),
                        "payload": [payload]})
    frames = sample_frames_batch(pdf, real=True)
    assert list(frames["frame_idx"]) == [0, 3, 6]
    assert (frames["doc_id"] == 7).all()


def test_multimodal_real_wav_codec_roundtrip():
    """The stdlib WAV path is a REAL codec exercise that never skips: the
    encode step writes a genuine RIFF/WAVE container and the decode step
    must recover channel count / rate / frame count from the fmt chunk and
    the sample sum from the actual PCM bytes (r4 verdict next-round item
    7).  Checked against independently-computed expectations AND against a
    hand-built header parse to prove the container is well-formed RIFF."""
    import pandas as pd

    from json_sql_database_storage_spark.llm.multimodal import (
        _WAV_RATE, _wav_params, decode_wav_batch, encode_wav_batch)

    doc_ids = pd.Series([0, 1, 5, 24, 101], dtype="int64")
    enc = encode_wav_batch(doc_ids)
    # container well-formedness: RIFF magic, WAVE form type, sane size field
    for b in enc["payload"]:
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        assert int.from_bytes(b[4:8], "little") == len(b) - 8
    out = decode_wav_batch(enc)
    for doc_id, row in zip(doc_ids, out.itertuples(index=False)):
        ch, frames = _wav_params(int(doc_id))
        assert row.n_channels == ch
        assert row.sample_rate == _WAV_RATE
        assert row.n_frames == frames
        want = sum((int(doc_id) * 31 + k * 7) % 2003 - 1001
                   for k in range(frames * ch))
        assert row.sum_samples == want


def test_incremental_dedup_equals_oneshot_delta_slice(spark, sf_dir):
    """Internal consistency beyond the oracle: the incremental form's pair
    set must equal the one-shot dedup_minhash_lsh result restricted to
    pairs touching the delta — the contract that lets a pipeline switch to
    incremental ingestion without changing its dedup semantics."""
    from json_sql_database_storage_spark.llm.dedup import (
        _INC_DELTA_MIN, _minhash_verified_pairs)

    inc = {(r["id_a"], r["id_b"]) for r in
           _SPECS["dedup_minhash_incremental"].fn(spark, sf_dir).collect()}
    oneshot = {(r["id_a"], r["id_b"]) for r in
               _minhash_verified_pairs(spark, sf_dir).collect()
               if r["id_a"] >= _INC_DELTA_MIN or r["id_b"] >= _INC_DELTA_MIN}
    assert inc == oneshot and inc


def test_pq_recall_above_chance_and_deterministic(spark, sf_dir):
    """PQ with UNTRAINED prefix codebooks (K=16, no Lloyd) on synthetic
    near-uniform embeddings is a lossy quantizer — recall@5 vs exact L2 is
    ~0.2-0.4 here, which is ~50× the 5/(n-1)≈0.5% random-chance floor.
    Pinned: (a) well above chance, so the codes genuinely carry geometry;
    (b) bit-deterministic across runs.  Production recall comes from
    trained codebooks (clustering.py's Lloyd recipe) + IVF composition,
    per the module docstring — this test documents the honest baseline."""
    from json_sql_database_storage_spark.llm.pq import l2sq
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import Window as W, functions as F

    pq1 = {(r["query_id"], r["neighbor_id"]) for r in
           _SPECS["sim_pq_adc_topk"].fn(spark, sf_dir).collect()}
    pq2 = {(r["query_id"], r["neighbor_id"]) for r in
           _SPECS["sim_pq_adc_topk"].fn(spark, sf_dir).collect()}
    assert pq1 == pq2                     # deterministic
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    sc = (v.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
          .select("query_id", F.col("vec_id").alias("neighbor_id"),
                  l2sq(F.col("e"), F.col("qe")).alias("d")))
    wq = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             sc.withColumn("rk", F.row_number().over(wq))
             .filter(F.col("rk") <= 5).collect()}
    recall = len(pq1 & exact) / len(exact)
    assert recall >= 0.15, recall         # ≥30× the chance floor


@pytest.mark.parametrize("band_sf_dir", [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1")
    if os.path.isdir(d)
])
def test_log_snap_guard_band(band_sf_dir):
    """The fixed-point snap floor(ln(N/c)·1e6 + 0.5) used by
    text_unigram_logprob (and the BM25 idf snap in llm/search.py) is only
    cross-engine-safe if no operand pair lands near a floor boundary: JVM
    Math.log and DuckDB's libm may differ in the last ulp (ADVICE r5 item
    5), which is ~3e-9 absolute in the ·1e6 domain.  Pin a ≥1e-6 guard band
    — 300× the worst-case ln divergence — for every distinct (N, c) the
    corpus actually produces, on both snap shapes.  Parametrized over EVERY
    sf dir the driver touches (r6 ADVICE item 5): the band is a per-corpus
    property, so it must be re-verified whenever test data changes, not
    only at the suite's default SF."""
    import math

    import duckdb

    from json_sql_database_storage_spark.llm.text_analysis import _LM_VOCAB

    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{band_sf_dir}/documents.parquet')")
    rows = duck.execute(r"""
      WITH w AS (SELECT doc_id,
                        unnest(regexp_split_to_array(lower(text), '\s+'))
                          AS term
                 FROM documents)
      SELECT (SELECT count(*) FROM w) AS n_tokens,
             (SELECT count(DISTINCT doc_id) FROM w) AS n_docs,
             list(DISTINCT c) AS counts,
             list(DISTINCT df) AS dfs
      FROM (SELECT term, count(*) AS c, count(DISTINCT doc_id) AS df
            FROM w GROUP BY term)
    """).fetchall()[0]
    n_tokens, n_docs, counts, dfs = rows

    def boundary_dist(t: float) -> float:
        frac = (t + 0.5) % 1.0
        return min(frac, 1.0 - frac)

    # unigram snap: ln(N/c)·1e6 over in-vocab counts plus the OOV c=1 path
    for c in set(counts) | {1}:
        t = math.log(n_tokens / c) * 1e6
        assert boundary_dist(t) > 1e-6, (c, t)
    # BM25 idf snap: ln(1 + (N−df+0.5)/(df+0.5))·1e6 over observed dfs
    for df in set(dfs):
        t = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1e6
        assert boundary_dist(t) > 1e-6, (df, t)
    # bigram-LM snap (round-9 staged text_bigram_logprob):
    # ln((c1+V)/(cb+1))·1e6 over every (unigram-count, bigram-count) pair
    # the corpus actually produces
    pairs = duck.execute(r"""
      WITH toks AS (SELECT regexp_split_to_array(lower(text), '\s+') AS t
                    FROM documents),
      bidx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
               FROM toks),
      big AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM bidx),
      uni AS (SELECT w1, count(*) AS c1
              FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
      v AS (SELECT count(*) AS v FROM uni),
      bi AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2)
      SELECT DISTINCT uni.c1 + v.v AS num, bi.cb + 1 AS den
      FROM bi JOIN uni USING (w1) CROSS JOIN v
    """).fetchall()
    for num, den in pairs:
        t = math.log(num / den) * 1e6
        assert boundary_dist(t) > 1e-6, (num, den, t)


def test_ivfpq_recall_contract(spark, sf_dir):
    """r6.2: the TRAINED-codebook IVFPQ path must deliver recall@5 >= 0.8
    vs exact L2 over the full corpus (numpy-validated design point:
    0.88/0.88/0.82 at sf0.001/0.01/0.1; the untrained-codebook baseline is
    0.70-0.86) — the materially-above-chance-floor contract the r5 verdict
    asked to replace the old >= 0.15 bound with."""
    from json_sql_database_storage_spark.llm.pq import _IPQ_NQ, _IPQ_TOPK, l2sq
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import Window as W, functions as F

    got = {(r["query_id"], r["neighbor_id"]) for r in
           _SPECS["sim_ivfpq_topk"].fn(spark, sf_dir).collect()}
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < _IPQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    sc = (v.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
          .select("query_id", F.col("vec_id").alias("neighbor_id"),
                  l2sq(F.col("e"), F.col("qe")).alias("d")))
    wq = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             sc.withColumn("rk", F.row_number().over(wq))
             .filter(F.col("rk") <= _IPQ_TOPK).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall


def test_cms_merge_equals_direct_and_overestimates(spark, sf_dir):
    """r6.8: (a) per-language CMS counter tables merged by addition equal
    the directly-built global table cell-for-cell (the mergeable-summary
    property that lets shards sketch independently); (b) every estimate
    is >= its exact count (one-sided error), and the total overestimate
    respects the 2N/w bound shape."""
    from json_sql_database_storage_spark.llm.sketches import cms_counters
    from json_sql_database_storage_spark.llm.text_analysis import tokens
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
    direct = {(r["i"], r["bkt"]): r["c"]
              for r in cms_counters(toks).collect()}
    per_lang = cms_counters(toks, ["lang"])
    merged = {(r["i"], r["bkt"]): r["c"] for r in
              per_lang.groupBy("i", "bkt").agg(F.sum("c").alias("c"))
              .collect()}
    assert merged == direct
    rows = _SPECS["text_count_min_sketch"].fn(spark, sf_dir).collect()
    assert rows
    n = sum(r["exact_c"] for r in rows)
    for r in rows:
        assert r["cms_est"] >= r["exact_c"], r
        assert r["cms_est"] - r["exact_c"] <= 2 * n / 256 + 1, r


def test_bm25_and_phrase_absent_terms(spark, sf_dir):
    """Retrieval edge cases: a query term absent from the corpus
    contributes nothing to BM25 (no crash, no NaN), and a phrase that
    never occurs returns an empty frame with the right schema."""
    import json_sql_database_storage_spark.llm.search as search
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    from json_sql_database_storage_spark.operators.scans import _sink
    idx_path = _sink("inv_pos_edge", spark)
    (search.build_positional_index(docs)
     .repartition(4, "bkt")
     .write.mode("overwrite").partitionBy("bkt").parquet(idx_path))
    idx = spark.read.parquet(idx_path)

    def postings(term):
        return idx.filter(F.col("term") == term).select("doc_id", "pos")

    # phrase with an absent second term → empty join, stable schema
    p1 = postings("join")
    p2 = postings("zzznotaterm").select("doc_id",
                                        (F.col("pos") - 1).alias("pos"))
    out = (p1.join(p2, ["doc_id", "pos"])
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")))
    assert out.count() == 0
    assert out.columns == ["doc_id", "n"]


def test_bpe_train_matches_reference_implementation(spark, sf_dir):
    """r6.13: the unrolled-plan BPE trainer must produce exactly the
    merges a straightforward Python reference implementation (greedy
    left-to-right apply, (count desc, pair) argmax) picks on the same
    word-frequency table — pinning that the higher-order-function fold
    implements real Sennrich-style BPE, not an approximation."""
    from collections import Counter

    from json_sql_database_storage_spark.llm.bpe import _BPE_MERGES
    from json_sql_database_storage_spark.llm.text_analysis import tokens
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    freqs = {r["term"]: r["freq"] for r in
             d.select(F.explode(tokens(F.col("text"))).alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
             .collect()}
    words = {t: list(t) for t in freqs}
    expected = []
    for _ in range(_BPE_MERGES):
        pc = Counter()
        for t, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += freqs[t]
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for t, syms in words.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[t] = out
        census = sum(freqs[t] * len(s) for t, s in words.items())
        expected.append((a, b, cnt, census))
    got = [(r["a"], r["b"], r["cnt"], r["n_symbols_after"]) for r in
           _SPECS["text_bpe_train"].fn(spark, sf_dir).collect()]
    assert got == expected


def test_ivfpq_margin_guard_band(spark, sf_dir):
    """r6 ADVICE item 4: sim_ivfpq_topk's cross-engine hash-exactness rests
    on every cb1-dependent DECISION (PQ code assignment; ADC shortlist
    membership at the srk=R boundary) having a margin far above the
    ~1e-13 summation-order noise of the trained-codebook means.  Pin that
    empirically, the same way test_log_snap_guard_band pins the ln snap:
    min strict margin > 1e-8 (10^5 × the noise; measured 3.8e-5 at sf0.001
    and 1.6e-4 at sf0.01).  Cell assignment / probe selection score against
    RAW seed centroids (bit-identical in both engines) and the final
    re-rank is exact raw-vector arithmetic, so neither needs a band."""
    from json_sql_database_storage_spark.llm.clustering import assign_cells
    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_KC, _IPQ_NPROBE, _IPQ_NQ, _IPQ_R, _PQ_K, _pq_assign, l2sq,
        subvectors, train_codebooks)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import Window as W, functions as F

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    subs = subvectors(v).persist()
    cb1 = train_codebooks(subs, _PQ_K).persist()

    # (1) PQ code assignment: per (vec_id, m), best vs second-best distance
    # under the trained codebook.  A zero margin (exact tie) also fails —
    # a tie that one engine's cb1 floats see as a 1e-13 difference would
    # flip the (d, c_id) tie-break between engines.
    scored = (subs.join(F.broadcast(cb1), "m")
              .select("vec_id", "m", "c_id",
                      l2sq(F.col("sub"), F.col("csub")).alias("d")))
    wenc = W.partitionBy("vec_id", "m").orderBy("d", "c_id")
    assign_margin = (
        scored.withColumn("rk", F.row_number().over(wenc))
        .filter(F.col("rk") <= 2)
        .groupBy("vec_id", "m")
        .agg((F.max("d") - F.min("d")).alias("margin"))
        .agg(F.min("margin")).collect()[0][0])
    assert assign_margin > 1e-8, assign_margin

    # (2) ADC shortlist boundary: adc_dist at srk=R vs srk=R+1 per query
    # (membership is the only shortlist decision that matters — everything
    # inside the shortlist is exactly re-ranked).
    assigned = assign_cells(v, _IPQ_KC).select("vec_id", "cluster")
    cent0 = (v.filter(F.col("vec_id") < _IPQ_KC)
             .select(F.col("vec_id").alias("c_id"), F.col("e").alias("ce")))
    wq = W.partitionBy("query_id").orderBy("d", "c_id")
    probes = (v.filter(F.col("vec_id") < _IPQ_NQ)
              .select(F.col("vec_id").alias("query_id"), "e")
              .crossJoin(F.broadcast(cent0))
              .select("query_id", "c_id",
                      l2sq(F.col("e"), F.col("ce")).alias("d"))
              .withColumn("prk", F.row_number().over(wq))
              .filter(F.col("prk") <= _IPQ_NPROBE)
              .select("query_id", F.col("c_id").alias("qcell")))
    enc = _pq_assign(subs, cb1).select("vec_id", "m", "code")
    dtab = (subs.filter(F.col("vec_id") < _IPQ_NQ)
            .join(F.broadcast(cb1), "m")
            .select(F.col("vec_id").alias("query_id"),
                    F.col("m").alias("qm"), "c_id",
                    l2sq(F.col("sub"), F.col("csub")).alias("d")))
    cand = (assigned.join(F.broadcast(probes),
                          (F.col("cluster") == F.col("qcell"))
                          & (F.col("vec_id") != F.col("query_id")))
            .select("query_id", "vec_id"))
    adc = (cand.join(enc, "vec_id")
           .join(F.broadcast(dtab),
                 (F.col("m") == F.col("qm")) & (F.col("code") == F.col("c_id"))
                 & (cand["query_id"] == dtab["query_id"]))
           .drop(dtab["query_id"])
           .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
           .agg(F.sum("d").alias("adc_dist")))
    ws = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    boundary = (adc.withColumn("srk", F.row_number().over(ws))
                .filter(F.col("srk").isin(_IPQ_R, _IPQ_R + 1))
                .groupBy("query_id")
                .agg((F.max("adc_dist") - F.min("adc_dist")).alias("margin"),
                     F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") == 2))   # queries where the cut binds
    rows = boundary.agg(F.min("margin")).collect()
    if rows and rows[0][0] is not None:
        assert rows[0][0] > 1e-8, rows[0][0]
    subs.unpersist()
    cb1.unpersist()


def test_bpe_encode_matches_reference_tokenizer(spark, sf_dir):
    """r7.1: text_bpe_encode's per-doc BPE token counts and
    text_bpe_token_census's vocabulary census must equal a plain-Python
    reference tokenizer that (a) trains the same greedy argmax merges and
    (b) encodes every document word with the same left-to-right fold —
    the same recurrence the Spark merge_fold chains per learned merge."""
    from collections import Counter

    from json_sql_database_storage_spark.llm.bpe import _BPE_MERGES
    from json_sql_database_storage_spark.llm.text_analysis import tokens
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    doc_words = {r["doc_id"]: r["ws"] for r in
                 d.select("doc_id", tokens(F.col("text")).alias("ws"))
                 .collect()}
    freqs = Counter(t for ws in doc_words.values() for t in ws)
    words = {t: list(t) for t in freqs}
    for _ in range(_BPE_MERGES):
        pc = Counter()
        for t, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += freqs[t]
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for t, syms in words.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[t] = out

    exp_docs = {doc_id: (len(ws), sum(len(words[t]) for t in ws))
                for doc_id, ws in doc_words.items()}
    got_docs = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
                _SPECS["text_bpe_encode"].fn(spark, sf_dir).collect()}
    assert got_docs == exp_docs

    exp_census = Counter()
    for t, syms in words.items():
        for s in syms:
            exp_census[s] += freqs[t]
    got_census = {r["token"]: r["n_occurrences"] for r in
                  _SPECS["text_bpe_token_census"].fn(spark, sf_dir).collect()}
    assert got_census == dict(exp_census)


def test_ivfpq_residual_recall_contract(spark, sf_dir):
    """r7.4: the residual-encoded IVFPQ (trained coarse + r = x − centroid
    + 2-Lloyd PQ) must (a) hold recall@5 >= 0.8 vs exact L2, (b) never be
    worse than the raw-vector form on the same corpus, and (c) be STRICTLY
    better where the corpus clusters (sf0.001: 0.94 vs 0.88, sf0.01: 0.92
    vs 0.88 — measured; at sf0.1 the synthetic embeddings are too weakly
    clustered for residuals to shrink and both forms measure 0.82, see
    llm/pq.py's r7.4 block for the sweep that established this)."""
    from json_sql_database_storage_spark.llm.pq import (_IPQ_NQ, _IPQ_TOPK,
                                                        l2sq)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import Window as W, functions as F

    res = {(r["query_id"], r["neighbor_id"]) for r in
           _SPECS["sim_ivfpq_residual_topk"].fn(spark, sf_dir).collect()}
    raw = {(r["query_id"], r["neighbor_id"]) for r in
           _SPECS["sim_ivfpq_topk"].fn(spark, sf_dir).collect()}
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < _IPQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    sc = (v.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
          .select("query_id", F.col("vec_id").alias("neighbor_id"),
                  l2sq(F.col("e"), F.col("qe")).alias("d")))
    wq = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             sc.withColumn("rk", F.row_number().over(wq))
             .filter(F.col("rk") <= _IPQ_TOPK).collect()}
    r_res = len(res & exact) / len(exact)
    r_raw = len(raw & exact) / len(exact)
    assert r_res >= 0.8, (r_res, r_raw)
    assert r_res >= r_raw, (r_res, r_raw)
    if os.path.basename(sf_dir.rstrip("/")) in ("sf0.001", "sf0.01"):
        assert r_res > r_raw, (r_res, r_raw)


def test_ivfpq_residual_margin_guard_band(spark, sf_dir):
    """r7.4 + r6 ADVICE item 4 extended: the residual variant adds a
    noise-sensitive decision family — cell assignment / probe choice now
    score against TRAINED (float-mean) coarse centroids, and PQ codes
    against the 2-iteration residual codebook.  Pin both margin families
    > 1e-8 like the raw variant's."""
    from json_sql_database_storage_spark.llm.clustering import (_assign,
                                                                _recenter,
                                                                assign_cells)
    from json_sql_database_storage_spark.llm.pq import (_IPQ_KC, _IPQR_PQ_ITERS,
                                                        _PQ_K, l2sq,
                                                        subvectors,
                                                        train_codebooks)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import Window as W, functions as F

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    cent1 = _recenter(assign_cells(v, _IPQ_KC)).persist()

    # (1) trained-coarse cell assignment: best vs second-best cell distance
    cscored = (v.crossJoin(F.broadcast(cent1))
               .select("vec_id", "c_id",
                       l2sq(F.col("e"), F.col("ce")).alias("d")))
    wc = W.partitionBy("vec_id").orderBy("d", "c_id")
    cmargin = (cscored.withColumn("rk", F.row_number().over(wc))
               .filter(F.col("rk") <= 2)
               .groupBy("vec_id")
               .agg((F.max("d") - F.min("d")).alias("margin"))
               .agg(F.min("margin")).collect()[0][0])
    assert cmargin > 1e-8, cmargin

    # (2) residual PQ code assignment under the 2-Lloyd codebook
    a1 = _assign(v, cent1)
    res = (a1.join(F.broadcast(cent1), a1["cluster"] == cent1["c_id"])
           .select("vec_id",
                   F.zip_with("e", "ce", lambda x, y: x - y).alias("e")))
    subs = subvectors(res).persist()
    cbr = train_codebooks(subs, _PQ_K, iters=_IPQR_PQ_ITERS).persist()
    scored = (subs.join(F.broadcast(cbr), "m")
              .select("vec_id", "m", "c_id",
                      l2sq(F.col("sub"), F.col("csub")).alias("d")))
    wenc = W.partitionBy("vec_id", "m").orderBy("d", "c_id")
    pmargin = (scored.withColumn("rk", F.row_number().over(wenc))
               .filter(F.col("rk") <= 2)
               .groupBy("vec_id", "m")
               .agg((F.max("d") - F.min("d")).alias("margin"))
               .agg(F.min("margin")).collect()[0][0])
    assert pmargin > 1e-8, pmargin
    cent1.unpersist()
    subs.unpersist()
    cbr.unpersist()


def test_bm25_build_once_probe_many(spark, sf_dir):
    """r7.2: the build/probe split must actually serve the
    build-once/probe-many deployment — ONE bm25_build's artifacts answer
    different term sets, each probe plan touching only index artifacts
    (no documents scan), and re-probing the same terms is deterministic."""
    from json_sql_database_storage_spark.llm.search import (_BM25_TERMS,
                                                            _BM25_TOPK,
                                                            bm25_build,
                                                            bm25_probe)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    paths = bm25_build(spark, docs, "bm25_many")
    r1 = bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK)
    r2 = bm25_probe(spark, paths, ("merge", "sort"), _BM25_TOPK)
    plan2 = r2._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan2
    rows1a = [tuple(r) for r in r1.collect()]
    rows1b = [tuple(r) for r in bm25_probe(spark, paths, _BM25_TERMS,
                                           _BM25_TOPK).collect()]
    assert rows1a == rows1b                 # deterministic re-probe
    assert rows1a and r2.count() > 0        # both term sets answered


def test_bpe_deep_training_matches_reference(spark, sf_dir):
    """r7.5 applied to BPE, depth raised 10 → 50 merges (r7 verdict
    next-round #8): 50 merges through the checkpointed driver loop — well
    past the ~dozen-merge unrolled-plan ceiling — must produce the SAME
    merge list and the same encoded word types as the plain-Python
    reference trainer — the checkpoint only truncates lineage, and the
    recurrence is the unrolled form's.  Per-segment wall times at this
    depth are recorded in SCALE.md next to the PageRank/k-means rows."""
    from collections import Counter

    from json_sql_database_storage_spark.llm.bpe import train_merges_deep
    from json_sql_database_storage_spark.llm.text_analysis import tokens
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    N = 50
    s, merges = train_merges_deep(spark, sf_dir, N, checkpoint_every=4)

    d = load_table(spark, sf_dir, "documents")
    freqs = Counter()
    for r in (d.select(F.explode(tokens(F.col("text"))).alias("t"))
              .groupBy("t").agg(F.count(F.lit(1)).alias("f")).collect()):
        freqs[r["t"]] = r["f"]
    words = {t: list(t) for t in freqs}
    expected_merges = []
    for _ in range(N):
        pc = Counter()
        for t, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += freqs[t]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected_merges.append((a, b, cnt))
        for t, syms in words.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[t] = out

    assert merges == expected_merges
    got = {r["term"]: r["syms"] for r in s.collect()}
    assert got == words


def test_ivfpq_build_once_probe_many(spark, sf_dir):
    """r7.13: one ivfpq_build's persisted artifacts (centroids, codebook,
    cell-partitioned codes) answer multiple query sets; the first set's
    top-k equals the registered one-shot exhibit's output (parquet doubles
    round-trip bit-exactly, so the probe sees identical codebook floats),
    and re-probing is deterministic."""
    from json_sql_database_storage_spark.llm.pq import (_IPQ_NQ, ivfpq_build,
                                                        ivfpq_probe)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    paths = ivfpq_build(spark, v, "ivfpq_many")
    q1 = (v.filter(F.col("vec_id") < _IPQ_NQ)
          .select(F.col("vec_id").alias("query_id"), "e"))
    got = [tuple(r) for r in ivfpq_probe(spark, paths, q1, v).collect()]
    expected = [tuple(r) for r in
                _SPECS["sim_ivfpq_topk"].fn(spark, sf_dir).collect()]
    assert got == expected
    # a different query set against the SAME build
    q2 = (v.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
          .select(F.col("vec_id").alias("query_id"), "e"))
    r2a = [tuple(r) for r in ivfpq_probe(spark, paths, q2, v).collect()]
    r2b = [tuple(r) for r in ivfpq_probe(spark, paths, q2, v).collect()]
    assert r2a == r2b and r2a


def test_ivfpq_append_equals_rebuild_with_frozen_codebook(spark, sf_dir):
    """r8 (r7 verdict next-round #5): ivfpq_append must encode deltas
    against the FROZEN persisted codebook/centroids into the existing
    cell layout such that probe(base build + append(delta)) is
    row-identical to probe(an index encoding base ∪ delta with the SAME
    frozen artifacts).  The base corpus is never re-encoded — O(delta)
    per crawl, the dedup_minhash_incremental contract for the ANN index."""
    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_append, ivfpq_build, ivfpq_probe, ivfpq_reencode)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.operators.scans import _sink
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    n = v.count()
    split = int(n * 0.8)
    base, delta = v.filter(F.col("vec_id") < split), \
        v.filter(F.col("vec_id") >= split)
    assert delta.count() > 0

    paths = ivfpq_build(spark, base, "ivfpq_app_base")
    ivfpq_append(spark, paths, delta)

    rebuilt = ivfpq_reencode(spark, paths, v, "ivfpq_app_rebuild")

    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    got = [tuple(r) for r in ivfpq_probe(spark, paths, q, v).collect()]
    want = [tuple(r) for r in ivfpq_probe(spark, rebuilt, q, v).collect()]
    assert got == want and got
    # the appended rows really live in the index (delta ids are findable)
    idx = spark.read.parquet(paths["index"])
    assert idx.filter(F.col("vec_id") >= split).count() > 0


def test_bm25_append_equals_rebuild(spark, sf_dir):
    """r8 (r7 verdict next-round #6): bm25_append must tokenize ONLY the
    delta and leave an index whose probe is row-identical to a full
    rebuild over base ∪ delta — postings appended to term buckets, dl
    rows appended, 1-row stats rewritten as old + delta — and the probe
    plan stays documents-scan-free."""
    from json_sql_database_storage_spark.llm.search import (_BM25_TERMS,
                                                            _BM25_TOPK,
                                                            bm25_append,
                                                            bm25_build,
                                                            bm25_probe)
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    split = int(n * 0.8)
    base, delta = docs.filter(F.col("doc_id") < split), \
        docs.filter(F.col("doc_id") >= split)
    assert delta.count() > 0

    paths = bm25_build(spark, base, "bm25_app_base")
    bm25_append(spark, paths, delta)
    full = bm25_build(spark, docs, "bm25_app_full")

    got_df = bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK)
    got = [tuple(r) for r in got_df.collect()]
    want = [tuple(r) for r in
            bm25_probe(spark, full, _BM25_TERMS, _BM25_TOPK).collect()]
    assert got == want and got
    # stats reflect the whole corpus after append (manifest metadata)
    from json_sql_database_storage_spark.llm.search import bm25_stats

    assert bm25_stats(spark, paths) == bm25_stats(spark, full)
    # probe over the appended index still never scans the corpus
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan


def test_bm25_apply_changes_handles_updates_and_deletes(spark, sf_dir):
    """r9 (r8 verdict next-round #2): index maintenance beyond adds.  A
    crawl that UPDATES an indexed doc's text and DELETES another must not
    leave stale postings live — the old append-only path provably serves
    the deleted doc (the stale-hit case, pinned failing first), while
    bm25_apply_changes tombstones the changed docs' old segments, appends
    the new text, fixes the stats relationally, and probes row-identical
    to a rebuild over the post-change corpus.  bm25_compact then drops
    the dead rows physically and stays value-neutral."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_append, bm25_apply_changes,
        bm25_build, bm25_compact, bm25_probe)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_chg_base")
    top = bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()
    victim, updated = int(top[0]["doc_id"]), int(top[1]["doc_id"])
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1

    upserts = (docs.filter(F.col("doc_id") == updated)
               .withColumn("text", F.lit("nothing relevant any more"))
               .unionByName(spark.createDataFrame(
                   [(new_id, " ".join(_BM25_TERMS) + " fresh crawl page")],
                   "doc_id bigint, text string")))
    deleted = spark.createDataFrame([(victim,)], "doc_id bigint")

    # stale-hit pin: plain append (the adds-only verb) leaves the deleted
    # doc's postings live — the probe still returns it
    stale = bm25_build(spark, docs, "bm25_chg_stale")
    bm25_append(spark, stale, upserts)
    stale_ids = {int(r["doc_id"]) for r in
                 bm25_probe(spark, stale, _BM25_TERMS, _BM25_TOPK).collect()}
    assert victim in stale_ids, (
        "stale-hit premise broken: pick a victim that matches the query")

    # the right verb: tombstone updates+deletes, append the new text
    bm25_apply_changes(spark, paths, upserts, deleted)
    got_df = bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK)
    got = [tuple(r) for r in got_df.collect()]
    post = (docs.filter(~F.col("doc_id").isin(victim, updated))
            .unionByName(upserts))
    full = bm25_build(spark, post, "bm25_chg_full")
    want = [tuple(r) for r in
            bm25_probe(spark, full, _BM25_TERMS, _BM25_TOPK).collect()]
    assert got == want and got
    assert victim not in {t[0] for t in got}
    assert new_id in {t[0] for t in got}
    from json_sql_database_storage_spark.llm.search import (
        _bm25_dl, _bm25_manifest, _bm25_tomb, bm25_stats)

    assert bm25_stats(spark, paths) == bm25_stats(spark, full)
    # probe plan stays corpus-free (tombstone join reads index artifacts)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan

    # compact: physical drop of dead rows, value-neutral, tombstones empty
    n_live_dl = post.count()
    bm25_compact(spark, paths)
    after = [tuple(r) for r in
             bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    assert after == want
    mc = _bm25_manifest(paths)
    assert _bm25_tomb(spark, paths, mc).count() == 0
    assert _bm25_dl(spark, paths, mc).count() == n_live_dl


def test_ivfpq_apply_changes_handles_updates_and_deletes(spark, sf_dir):
    """r9 (r8 verdict next-round #2), vector side: deleting an indexed
    vector and moving another must kill their old code rows — even when
    the update lands the vector in a DIFFERENT cell.  Stale-hit pinned
    first via the adds-only append; then probe(apply_changes) ≡
    probe(frozen-codebook re-encode of the post-change corpus), and
    ivfpq_compact is value-neutral."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, _ivfpq_codes, _ivfpq_manifest, _ivfpq_tomb, ivfpq_append,
        ivfpq_apply_changes, ivfpq_build, ivfpq_compact, ivfpq_probe,
        ivfpq_reencode)
    from json_sql_database_storage_spark.sources import load_table

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").alias("e")))
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    paths = ivfpq_build(spark, v, "ivfpq_chg_base")
    base = ivfpq_probe(spark, paths, q, v).collect()
    neigh = [int(r["neighbor_id"]) for r in base
             if int(r["neighbor_id"]) >= _IPQ_NQ]
    victim, moved = neigh[0], next(x for x in neigh if x != neigh[0])
    new_id = int(v.agg(F.max("vec_id")).collect()[0][0]) + 1

    upserts = (v.filter(F.col("vec_id") == moved)
               .withColumn("e", F.transform("e", lambda x: -x))
               .unionByName(
                   v.filter(F.col("vec_id") == victim)
                   .select(F.lit(new_id).cast(v.schema["vec_id"].dataType)
                           .alias("vec_id"), "e")))
    deleted = spark.createDataFrame([(victim,)], "vec_id bigint")
    post = (v.filter(~F.col("vec_id").isin(victim, moved))
            .unionByName(upserts))

    # stale-hit pin: adds-only append leaves the victim's codes live, so
    # a reader whose raw-vector side table hasn't been cleaned yet (the
    # realistic torn state) still gets the deleted vector back
    stale = ivfpq_build(spark, v, "ivfpq_chg_stale")
    ivfpq_append(spark, stale, upserts)
    stale_ids = {int(r["neighbor_id"]) for r in
                 ivfpq_probe(spark, stale, q, v).collect()}
    assert victim in stale_ids

    ivfpq_apply_changes(spark, paths, upserts, deleted)
    got = [tuple(r) for r in ivfpq_probe(spark, paths, q, post).collect()]
    # frozen-codebook rebuild over the post-change corpus
    rebuilt = ivfpq_reencode(spark, paths, post, "ivfpq_chg_rebuild")
    want = [tuple(r) for r in ivfpq_probe(spark, rebuilt, q, post).collect()]
    assert got == want and got
    assert victim not in {t[1] for t in got}

    mr = _ivfpq_manifest(rebuilt)
    n_codes_live = _ivfpq_codes(spark, rebuilt, mr).count()
    ivfpq_compact(spark, paths)
    after = [tuple(r) for r in ivfpq_probe(spark, paths, q, post).collect()]
    assert after == want
    mc = _ivfpq_manifest(paths)
    assert _ivfpq_tomb(spark, paths, mc).count() == 0
    assert _ivfpq_codes(spark, paths, mc).count() == n_codes_live


def test_index_maintain_policy_compacts_only_past_threshold(spark, sf_dir):
    """r9: the compaction POLICY — below the tombstone-ratio threshold
    maintain() is a metadata decision (no rewrite, tombstones kept);
    past it, it compacts (tombstones emptied) and stays value-neutral."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_apply_changes, bm25_build,
        bm25_maintain, bm25_probe)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_policy")
    assert bm25_maintain(spark, paths) is False       # nothing tombstoned

    # delete 1 doc: far below the 20% default — keep the tombstone
    one = spark.createDataFrame([(3,)], "doc_id bigint")
    bm25_apply_changes(spark, paths, docs.limit(0), one)
    want = [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    from json_sql_database_storage_spark.llm.search import (
        _bm25_dl, _bm25_manifest, _bm25_tomb)

    assert bm25_maintain(spark, paths) is False
    assert _bm25_tomb(spark, paths, _bm25_manifest(paths)).count() == 1

    # delete 30% of the corpus: past the threshold — compacts
    n = docs.count()
    many = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    bm25_apply_changes(spark, paths, docs.limit(0), many)
    assert bm25_maintain(spark, paths) is True
    mc = _bm25_manifest(paths)
    assert _bm25_tomb(spark, paths, mc).count() == 0
    live = (docs.filter(~(F.col("doc_id") % 3 == 1))
            .filter(F.col("doc_id") != 3))
    assert _bm25_dl(spark, paths, mc).count() == live.count() < n
    got = [tuple(r) for r in
           bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    # value-neutral relative to a pre-compact probe over the same state
    from json_sql_database_storage_spark.llm.search import bm25_build as _b
    full = _b(spark, live, "bm25_policy_full")
    assert got == [tuple(r) for r in
                   bm25_probe(spark, full, _BM25_TERMS, _BM25_TOPK)
                   .collect()]
    assert want  # the single-delete probe ran (sanity)


def test_bm25_index_commit_is_atomic_under_crash(spark, sf_dir, monkeypatch):
    """r9: the segments_N discipline under fire — a crash AFTER the new
    segment dirs are written but BEFORE the CAS manifest claim leaves the
    previous index version fully consistent (probe unchanged, stats
    unchanged), and the retried apply_changes then lands cleanly."""
    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_apply_changes, bm25_build, bm25_probe,
        bm25_stats)
    from json_sql_database_storage_spark.operators import snapshots
    from json_sql_database_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_crash")
    before = [tuple(r) for r in
              bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    s0 = bm25_stats(spark, paths)

    upserts = spark.createDataFrame(
        [(7, "join vector join vector crash probe")],
        "doc_id bigint, text string")
    deleted = spark.createDataFrame([(int(before[0][0]),)],
                                    "doc_id bigint")

    orig = snapshots.commit_manifest

    def boom(root, version, manifest):
        if "bm25_crash_meta" in root:
            raise RuntimeError("injected crash before the manifest claim")
        return orig(root, version, manifest)

    monkeypatch.setattr(snapshots, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        bm25_apply_changes(spark, paths, upserts, deleted)
    monkeypatch.setattr(snapshots, "commit_manifest", orig)

    # previous version fully intact — the orphaned seg dirs are invisible
    assert [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()] \
        == before
    assert bm25_stats(spark, paths) == s0

    # the retry lands, and the result equals a rebuild over the
    # post-change corpus
    bm25_apply_changes(spark, paths, upserts, deleted)
    post = (docs.filter(~F.col("doc_id").isin(7, int(before[0][0])))
            .unionByName(upserts))
    full = bm25_build(spark, post, "bm25_crash_full")
    got = [tuple(r) for r in
           bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    want = [tuple(r) for r in
            bm25_probe(spark, full, _BM25_TERMS, _BM25_TOPK).collect()]
    assert got == want and got


def test_ivfpq_index_commit_is_atomic_under_crash(spark, sf_dir,
                                                  monkeypatch):
    """r9, the vector twin of the BM25 crash pin: a crash after the new
    code/tombstone segment dirs land but before the CAS manifest claim
    leaves the previous index version fully consistent, and the retried
    apply_changes then lands cleanly (orphaned seg dirs cleared, not
    merged into)."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_apply_changes, ivfpq_build, ivfpq_probe,
        ivfpq_reencode)
    from json_sql_database_storage_spark.operators import snapshots
    from json_sql_database_storage_spark.sources import load_table

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").alias("e")))
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    paths = ivfpq_build(spark, v, "ivfpq_crash")
    before = [tuple(r) for r in ivfpq_probe(spark, paths, q, v).collect()]

    victim = _IPQ_NQ + 5
    upserts = (v.filter(F.col("vec_id") == _IPQ_NQ + 9)
               .withColumn("e", F.transform("e", lambda x: -x)))
    deleted = spark.createDataFrame([(victim,)], "vec_id bigint")

    orig = snapshots.commit_manifest

    def boom(root, version, manifest):
        if "ivfpq_crash_meta" in root:
            raise RuntimeError("injected crash before the manifest claim")
        return orig(root, version, manifest)

    monkeypatch.setattr(snapshots, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ivfpq_apply_changes(spark, paths, upserts, deleted)
    monkeypatch.setattr(snapshots, "commit_manifest", orig)

    assert [tuple(r) for r in
            ivfpq_probe(spark, paths, q, v).collect()] == before

    ivfpq_apply_changes(spark, paths, upserts, deleted)
    post = (v.filter(~F.col("vec_id").isin(victim, _IPQ_NQ + 9))
            .unionByName(upserts))
    rebuilt = ivfpq_reencode(spark, paths, post, "ivfpq_crash_rebuild")
    got = [tuple(r) for r in ivfpq_probe(spark, paths, q, post).collect()]
    want = [tuple(r) for r in
            ivfpq_probe(spark, rebuilt, q, post).collect()]
    assert got == want and got


def test_index_vacuum_sweeps_rolled_over_segments(spark, sf_dir):
    """r9: after compaction, the rolled-over segment dirs are
    unreferenced history — vacuum deletes them (and expired manifests)
    while the probe stays identical; the compacted segment survives."""
    import os

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_apply_changes, bm25_build,
        bm25_compact, bm25_probe, bm25_vacuum)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_vac")
    bm25_apply_changes(
        spark, paths,
        spark.createDataFrame([(7, "join vector vacuum probe")],
                              "doc_id bigint, text string"),
        spark.createDataFrame([(11,)], "doc_id bigint"))
    bm25_compact(spark, paths)
    want = [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]

    def segs(root):
        return sorted(e.name for e in os.scandir(root)
                      if e.is_dir() and e.name.startswith("seg="))

    assert len(segs(paths["index"])) == 3      # build + apply + compact
    deleted = bm25_vacuum(paths, keep_last=1)
    assert deleted, "vacuum found nothing to sweep?"
    assert segs(paths["index"]) == ["seg=2"]   # only the compacted seg
    assert segs(paths["dl"]) == ["seg=2"]
    got = [tuple(r) for r in
           bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    assert got == want and got
    n_manifests = len([e for e in os.scandir(paths["meta"])
                       if e.name.startswith("manifest-v")])
    assert n_manifests == 1

    # vector twin
    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_apply_changes, ivfpq_build, ivfpq_compact,
        ivfpq_probe, ivfpq_vacuum)

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").alias("e")))
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    vp = ivfpq_build(spark, v, "ivfpq_vac")
    ivfpq_apply_changes(spark, vp, v.limit(0),
                        spark.createDataFrame([(int(_IPQ_NQ) + 4,)],
                                              "vec_id bigint"))
    ivfpq_compact(spark, vp)
    vv = v.filter(F.col("vec_id") != _IPQ_NQ + 4)
    vwant = [tuple(r) for r in ivfpq_probe(spark, vp, q, vv).collect()]
    vdel = ivfpq_vacuum(vp, keep_last=1)
    assert vdel
    assert segs(vp["index"]) == ["seg=2"]
    assert [tuple(r) for r in
            ivfpq_probe(spark, vp, q, vv).collect()] == vwant


def test_bm25_random_maintenance_sequence_matches_model(spark, sf_dir):
    """r9 model-based pin (the DocumentStore random-op test's index
    twin): a seeded random sequence of append / apply_changes / compact /
    maintain / vacuum, after EACH step probed against a fresh rebuild of
    an in-memory model corpus — the whole verb set composes, in any
    order, without drift."""
    import random

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_append, bm25_apply_changes,
        bm25_build, bm25_compact, bm25_maintain, bm25_probe, bm25_stats,
        bm25_vacuum)
    from json_sql_database_storage_spark.sources import load_table

    rng = random.Random(20260815)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = {int(r["doc_id"]): r["text"] for r in docs.collect()}
    base_ids = sorted(model)
    next_id = max(base_ids) + 1

    paths = bm25_build(spark, docs, "bm25_model")
    words = ["join", "vector", "dup", "merge", "sort", "crawl", "page"]

    def rand_text():
        return " ".join(rng.choice(words)
                        for _ in range(rng.randint(3, 12)))

    for step in range(8):
        op = rng.choice(["append", "apply", "apply", "compact", "maintain",
                         "vacuum"])
        if op == "append":
            rows = [(next_id + i, rand_text()) for i in range(3)]
            next_id += 3
            for i, t in rows:
                model[i] = t
            bm25_append(spark, paths,
                        spark.createDataFrame(rows,
                                              "doc_id bigint, text string"))
        elif op == "apply":
            live = sorted(model)
            upd = rng.sample(live, 3)
            dele = rng.sample([x for x in live if x not in upd], 2)
            rows = [(i, rand_text()) for i in upd]
            rows.append((next_id, rand_text()))
            for i, t in rows:
                model[i] = t
            next_id += 1
            for i in dele:
                del model[i]
            bm25_apply_changes(
                spark, paths,
                spark.createDataFrame(rows, "doc_id bigint, text string"),
                spark.createDataFrame([(i,) for i in dele],
                                      "doc_id bigint"))
        elif op == "compact":
            bm25_compact(spark, paths)
        elif op == "maintain":
            bm25_maintain(spark, paths, max_tomb_ratio=0.05)
        elif op == "vacuum":
            bm25_vacuum(paths, keep_last=1)
        got = [tuple(r) for r in
               bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
        fresh = bm25_build(
            spark,
            spark.createDataFrame(sorted(model.items()),
                                  "doc_id bigint, text string"),
            f"bm25_model_ref_{step}")
        want = [tuple(r) for r in
                bm25_probe(spark, fresh, _BM25_TERMS, _BM25_TOPK).collect()]
        assert got == want and got, (step, op)
        assert bm25_stats(spark, paths) == bm25_stats(spark, fresh), \
            (step, op)


def test_ivfpq_random_maintenance_sequence_matches_model(spark, sf_dir):
    """r9 model-based pin, vector twin: seeded random append /
    apply_changes / compact / maintain / vacuum sequences, after each
    step probed against a frozen-codebook re-encode of the in-memory
    model corpus."""
    import random

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_append, ivfpq_apply_changes, ivfpq_build,
        ivfpq_compact, ivfpq_maintain, ivfpq_probe, ivfpq_reencode,
        ivfpq_vacuum)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.sources import load_table

    rng = random.Random(20260815)
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    model = {int(r["vec_id"]): list(r["e"]) for r in v.collect()}
    next_id = max(model) + 1
    protected = set(range(_IPQ_NQ))        # the fixed query vectors

    paths = ivfpq_build(spark, v, "ivfpq_model")
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))

    def df_of(items):
        return spark.createDataFrame(
            [(i, e) for i, e in items],
            "vec_id bigint, e array<double>")

    for step in range(6):
        op = rng.choice(["append", "apply", "apply", "compact",
                         "maintain", "vacuum"])
        if op == "append":
            src = rng.sample(sorted(model), 2)
            rows = [(next_id + k, [-x for x in model[s]])
                    for k, s in enumerate(src)]
            next_id += 2
            model.update(dict(rows))
            ivfpq_append(spark, paths, df_of(rows))
        elif op == "apply":
            free = [i for i in sorted(model) if i not in protected]
            upd = rng.sample(free, 2)
            dele = rng.sample([i for i in free if i not in upd], 1)
            rows = [(i, [x * -1.0 for x in model[i]]) for i in upd]
            rows.append((next_id, [x + 1.0 for x in model[upd[0]]]))
            next_id += 1
            model.update(dict(rows))
            for i in dele:
                del model[i]
            ivfpq_apply_changes(spark, paths, df_of(rows),
                                spark.createDataFrame(
                                    [(i,) for i in dele], "vec_id bigint"))
        elif op == "compact":
            ivfpq_compact(spark, paths)
        elif op == "maintain":
            ivfpq_maintain(spark, paths, max_tomb_ratio=0.02)
        elif op == "vacuum":
            ivfpq_vacuum(paths, keep_last=1)
        corpus = df_of(sorted(model.items()))
        got = [tuple(r) for r in
               ivfpq_probe(spark, paths, q, corpus).collect()]
        fresh = ivfpq_reencode(spark, paths, corpus,
                               f"ivfpq_model_ref_{step}")
        want = [tuple(r) for r in
                ivfpq_probe(spark, fresh, q, corpus).collect()]
        assert got == want and got, (step, op)


def test_index_write_lock_excludes_second_writer(spark, sf_dir):
    """r9: the write.lock discipline enforced, not just documented — a
    second writer entering a locked index raises instead of corrupting
    shared segment space; a crashed holder's STALE lock is broken; the
    lock always releases on exception (the crash-injection tests pass
    through it)."""
    import os
    import time

    import json_sql_database_storage_spark.llm.search as search
    from json_sql_database_storage_spark.llm.search import (
        ConcurrentIndexWriter, _index_write_lock, bm25_append, bm25_build)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_lock")
    delta = spark.createDataFrame(
        [(10 ** 9, "join vector lock probe")], "doc_id bigint, text string")

    # a held lock excludes the second writer
    with _index_write_lock(paths["meta"]):
        with pytest.raises(ConcurrentIndexWriter):
            bm25_append(spark, paths, delta)
    # released on exit: the same append now lands
    bm25_append(spark, paths, delta)

    # a stale lock (crashed holder — invalid pid) is broken, not honored
    # forever
    lock = os.path.join(paths["meta"], "write.lock")
    with open(lock, "w") as f:
        f.write("0")
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))
    bm25_append(spark, paths,
                spark.createDataFrame([(10 ** 9 + 1, "stale lock broken")],
                                      "doc_id bigint, text string"))
    assert not os.path.exists(lock)

    # r10 (advice): age alone never breaks a LIVE holder's lock — a
    # legitimate build/compact outliving the stale threshold keeps it
    # (the pid records a running process: this one)
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))
    try:
        with pytest.raises(ConcurrentIndexWriter):
            bm25_append(spark, paths, delta)
        assert os.path.exists(lock)    # the live holder's lock survives
    finally:
        os.remove(lock)


def test_index_vacuum_is_idempotent_and_locked(spark, sf_dir):
    """r10 (advice): (a) repeated vacuums — including after intervening
    commits — are no-ops for the already-reclaimed manifest range, not
    FileNotFoundError crashes mid-sweep; (b) vacuum takes write.lock, so
    it can never sweep an in-flight writer's uncommitted seg dir right
    before that writer's CAS publishes it (silent row loss)."""
    import os

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, ConcurrentIndexWriter, _index_write_lock,
        bm25_append, bm25_build, bm25_compact, bm25_probe, bm25_vacuum)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_revac")
    bm25_append(spark, paths,
                spark.createDataFrame([(10 ** 9, "join vector revac")],
                                      "doc_id bigint, text string"))
    bm25_compact(spark, paths)
    assert bm25_vacuum(paths, keep_last=1)          # first vacuum reclaims
    # intervening commit, then vacuum again: the expired-manifest range
    # below the previous head is already gone — must be a no-op for it,
    # not a crash (pre-fix: os.remove(manifest-v0) raised
    # FileNotFoundError mid-sweep, leaving seg dirs unreclaimed)
    bm25_append(spark, paths,
                spark.createDataFrame([(10 ** 9 + 1, "second revac")],
                                      "doc_id bigint, text string"))
    bm25_vacuum(paths, keep_last=1)
    # and a back-to-back vacuum with nothing new reclaims nothing
    assert bm25_vacuum(paths, keep_last=1) == []
    want = [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    assert want

    # (b) a held write.lock excludes vacuum entirely
    with _index_write_lock(paths["meta"]):
        with pytest.raises(ConcurrentIndexWriter):
            bm25_vacuum(paths, keep_last=1)

    # vector twin: same repeated-vacuum sequence through the IVFPQ verbs
    from json_sql_database_storage_spark.llm.pq import (
        ivfpq_append, ivfpq_build, ivfpq_compact, ivfpq_vacuum)

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").alias("e")))
    vp = ivfpq_build(spark, v, "ivfpq_revac")
    ivfpq_append(spark, vp, v.limit(3).select(
        (F.col("vec_id") + 10 ** 9).alias("vec_id"), "e"))
    ivfpq_compact(spark, vp)
    assert ivfpq_vacuum(vp, keep_last=1)
    ivfpq_append(spark, vp, v.limit(2).select(
        (F.col("vec_id") + 2 * 10 ** 9).alias("vec_id"), "e"))
    ivfpq_vacuum(vp, keep_last=1)
    assert ivfpq_vacuum(vp, keep_last=1) == []
    with _index_write_lock(vp["meta"]):
        with pytest.raises(ConcurrentIndexWriter):
            ivfpq_vacuum(vp, keep_last=1)


def _stage_cdf_chunks(chunks) -> str:
    """Write each (doc_id, text, op) DataFrame as ONE parquet chunk file
    with increasing mtimes — the shared streaming/runner.py staging
    primitive, for document change feeds (maxFilesPerTrigger=1 → one
    micro-batch each)."""
    import tempfile

    from json_sql_database_storage_spark.streaming.runner import (
        stage_chunk_file,
    )

    base = tempfile.mkdtemp(prefix="bm25_cdf_stream_")
    for seq, df in enumerate(chunks):
        stage_chunk_file(df, base, seq)
    return base


def test_bm25_stream_maintain_replay_is_exactly_once(spark, sf_dir):
    """r10 (r9 verdict next-round #7): the streaming twin of the CDF→
    index loop.  Three CDF micro-batches (update, delete,
    update+delete-of-an-insert) flow through bm25_stream_maintain; then
    the WHOLE stream replays from scratch (fresh query, batch ids
    re-delivered from 0) and every batch no-ops on the manifest tag — the
    index commits exactly once per batch, and the final probe is
    row-identical to a batch rebuild over the post-change corpus."""
    import shutil

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_apply_changes, bm25_build,
        bm25_probe, bm25_stream_maintain)
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    paths = bm25_build(spark, docs, "bm25_stream")

    cdf = "doc_id bigint, text string, op string"
    chunks = [
        spark.createDataFrame(
            [(7, "join vector stream fresh", "u"),
             (new_id, "join vector crawl stream", "u")], cdf),
        spark.createDataFrame([(11, None, "d")], cdf),
        spark.createDataFrame(
            [(3, "vector benchmark stream update", "u"),
             (new_id, None, "d")], cdf),    # insert-then-delete across batches
    ]
    staged = _stage_cdf_chunks(chunks)
    try:
        bm25_stream_maintain(spark, paths, staged)
        v_after = current_version(paths["meta"])
        want = [tuple(r) for r in
                bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]

        # full replay from scratch: fresh query, no checkpoint → batches
        # re-delivered as 0,1,2 — every one must no-op on the manifest tag
        bm25_stream_maintain(spark, paths, staged)
        assert current_version(paths["meta"]) == v_after
        got = [tuple(r) for r in
               bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
        assert got == want and got

        # probe ≡ batch rebuild over the post-change corpus
        final = (docs.filter(~F.col("doc_id").isin(7, 3, 11))
                 .unionByName(spark.createDataFrame(
                     [(7, "join vector stream fresh"),
                      (3, "vector benchmark stream update")],
                     "doc_id bigint, text string")))
        full = bm25_build(spark, final, "bm25_stream_full")
        assert got == [tuple(r) for r in
                       bm25_probe(spark, full, _BM25_TERMS,
                                  _BM25_TOPK).collect()]

        # a tag GAP fails loudly (the versioned_batch_apply contract)
        with pytest.raises(ValueError, match="tag gap"):
            bm25_apply_changes(
                spark, paths,
                spark.createDataFrame([], "doc_id bigint, text string"),
                spark.createDataFrame([(5,)], "doc_id bigint"), tag=9)
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_ivfpq_stream_maintain_replay_is_exactly_once(spark, sf_dir):
    """r10: the vector twin of the streaming CDF→index loop.  Two CDF
    micro-batches (update-moves-vector, delete+insert) flow through
    ivfpq_stream_maintain; the whole stream replays from scratch and
    every batch no-ops on the manifest tag; the final probe is
    row-identical to a frozen-codebook rebuild over the post-change
    corpus (ivfpq_reencode — the apply_changes contract)."""
    import shutil

    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_build, ivfpq_probe, ivfpq_reencode,
        ivfpq_stream_maintain)
    from json_sql_database_storage_spark.operators.snapshots import (
        current_version,
    )
    from json_sql_database_storage_spark.sources import load_table

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("e")))
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    paths = ivfpq_build(spark, v, "ivfpq_stream")

    moved = int(_IPQ_NQ) + 3
    victim = int(_IPQ_NQ) + 7
    new_id = int(v.agg(F.max("vec_id")).collect()[0][0]) + 1
    moved_e = (v.filter(F.col("vec_id") == moved)
               .select(F.transform("e", lambda x: -x).alias("e")))
    chunks = [
        moved_e.select(F.lit(moved).cast("bigint").alias("vec_id"), "e",
                       F.lit("u").alias("op")),
        v.filter(F.col("vec_id") == victim)
        .select(F.lit(new_id).cast("bigint").alias("vec_id"), "e",
                F.lit("u").alias("op"))
        .unionByName(v.limit(1).select(
            F.lit(victim).cast("bigint").alias("vec_id"),
            F.lit(None).cast("array<double>").alias("e"),
            F.lit("d").alias("op"))),
    ]
    staged = _stage_cdf_chunks(chunks)
    try:
        ivfpq_stream_maintain(spark, paths, staged)
        v_after = current_version(paths["meta"])

        # post-change corpus: moved flipped, victim deleted, new_id added
        final = (v.filter(~F.col("vec_id").isin(moved, victim))
                 .unionByName(moved_e.select(
                     F.lit(moved).cast("bigint").alias("vec_id"), "e"))
                 .unionByName(v.filter(F.col("vec_id") == victim).select(
                     F.lit(new_id).cast("bigint").alias("vec_id"), "e")))
        want = [tuple(r) for r in
                ivfpq_probe(spark, paths, q, final).collect()]

        # full replay: every batch must no-op on the manifest tag
        ivfpq_stream_maintain(spark, paths, staged)
        assert current_version(paths["meta"]) == v_after
        got = [tuple(r) for r in
               ivfpq_probe(spark, paths, q, final).collect()]
        assert got == want and got

        # probe ≡ frozen-codebook rebuild over the post-change corpus
        full = ivfpq_reencode(spark, paths, final, "ivfpq_stream_full")
        assert got == [tuple(r) for r in
                       ivfpq_probe(spark, full, q, final).collect()]
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_index_lock_pid_reuse_and_atomic_break(spark, sf_dir, tmp_path):
    """r10 review fixes: (a) a stale lock whose recorded pid was RECYCLED
    (start-time mismatch) is breakable — same-host pid reuse can't wedge
    the index forever; (b) a lock recording this live process WITH its
    true start time is honored; (c) breaking leaves no stray .break-*
    files behind (the atomic-rename claim cleans up)."""
    import os
    import time

    from json_sql_database_storage_spark.llm.search import (
        _index_write_lock,
    )

    meta = str(tmp_path / "meta")
    lock = _index_write_lock(meta)
    pid = os.getpid()
    true_start = _index_write_lock._proc_start(pid)
    assert true_start is not None       # Linux sandbox: procfs available

    # (a) recycled pid: right pid, WRONG start time → provably not the
    # holder → breakable once stale-aged
    with open(lock.path, "w") as f:
        f.write(f"{pid}:{true_start + 1}")
    os.utime(lock.path, (time.time() - 10_000,) * 2)
    with lock:                           # acquires by breaking
        with open(lock.path) as f:
            txt = f.read()
        assert txt == f"{pid}:{true_start}"
    # (c) no stray break-claim files left behind
    assert [e for e in os.scandir(meta)
            if e.name.startswith("write.lock.break-")] == []

    # (b) the true (pid, start) pair reads as a live holder even when old
    with open(lock.path, "w") as f:
        f.write(f"{pid}:{true_start}")
    os.utime(lock.path, (time.time() - 10_000,) * 2)
    assert _index_write_lock._holder_alive(lock.path)
    os.remove(lock.path)


def test_index_vacuum_keep_window_skips_expired_manifests(spark, sf_dir):
    """r10 review fix: vacuum with keep_last larger than the surviving
    manifest count must SKIP the already-expired versions (they pin
    nothing), not crash reading them — the idempotence contract under a
    widened retention window."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_append, bm25_build, bm25_probe,
        bm25_vacuum)
    from json_sql_database_storage_spark.llm.pq import (
        ivfpq_append, ivfpq_build, ivfpq_vacuum)
    from json_sql_database_storage_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_widekeep")
    bm25_append(spark, paths,
                spark.createDataFrame([(10 ** 9, "join vector widekeep")],
                                      "doc_id bigint, text string"))
    bm25_vacuum(paths, keep_last=1)      # expires manifest v0
    # pre-fix: _bm25_manifest(paths, 0) raised FileNotFoundError here
    assert bm25_vacuum(paths, keep_last=5) == []
    assert bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).count() > 0

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").alias("e")))
    vp = ivfpq_build(spark, v, "ivfpq_widekeep")
    ivfpq_append(spark, vp, v.limit(2).select(
        (F.col("vec_id") + 10 ** 9).alias("vec_id"), "e"))
    ivfpq_vacuum(vp, keep_last=1)
    assert ivfpq_vacuum(vp, keep_last=5) == []


def test_minhash_expression_twin_matches_udf(spark, sf_dir):
    """r10 review: the expression form took its per-permutation minimum
    in SIGNED 64-bit order while the production UDF reduces uint64 —
    every lane disagreed on random hashes despite the docstring's
    bit-identity claim.  The expression now flips the sign bit around
    array_min (unsigned order via signed min); pin the two forms
    bit-equal on the real corpus."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm import dedup as D
    from json_sql_database_storage_spark.sources import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    D._hashed_shingles_of(
                        F.split(F.lower("text"), r"\s+")).alias("sh")))
    both = docs.select(
        "doc_id",
        D.minhash_signature_udf(F.col("sh")).alias("u"),
        D.minhash_signature(F.col("sh")).alias("x"))
    n_diff = both.filter(F.col("u") != F.col("x")).count()
    assert n_diff == 0
    assert both.count() > 0


def test_minhash_udf_propagates_null_shingles(spark):
    """r10 review: a NULL shingle array (NULL text upstream) must yield a
    NULL signature — the expression twin's and the oracles' behavior —
    not a len(None) TypeError that aborts the executor."""
    from json_sql_database_storage_spark.llm import dedup as D  # noqa: F401

    df = spark.createDataFrame(
        [(1, [11, 22, 33]), (2, None), (3, [5])],
        "doc_id bigint, sh array<bigint>")
    rows = (df.select("doc_id", D.minhash_signature_udf("sh").alias("sig"))
            .orderBy("doc_id").collect())
    assert rows[0]["sig"] is not None and len(rows[0]["sig"]) == D._NUM_HASHES
    assert rows[1]["sig"] is None
    assert rows[2]["sig"] is not None


def test_whitespace_split_cross_engine_on_vertical_tab(spark, tmp_path):
    """r10 review: Java's \\s includes \\x0B while RE2's (DuckDB's) does
    not, so the old raw \\s+ tokenizer silently diverged from every text
    oracle on documents containing a vertical tab.  WS_RE is RE2's exact
    class — pin both engines tokenizing a \\x0B document identically."""
    import duckdb

    from json_sql_database_storage_spark.llm.text_analysis import tokens
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "alpha\x0bbeta gamma", "en", "s", 16)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    spark_toks = (df.select(F.size(tokens(F.col("text"))).alias("n"))
                  .collect()[0]["n"])
    con = duckdb.connect()
    try:
        duck_toks = con.execute(
            "SELECT len(regexp_split_to_array(lower(text), '\\s+')) "
            f"FROM read_parquet('{path}/*.parquet')").fetchone()[0]
    finally:
        con.close()
    # one token containing the \x0B on both engines (neither splits it)
    assert spark_toks == duck_toks == 2
