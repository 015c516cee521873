"""Independent-model checks for the round-4 event/CDC operators: the same
testdata recomputed with pandas (merge_asof, sort+drop_duplicates) and a
brute-force python funnel — a third opinion beside the Spark implementation
and the DuckDB oracle, pinning semantics the SQL twin could share a
misreading of (tolerance boundary, tie-breaks, strict ordering)."""

from __future__ import annotations

import os

import pandas as pd

from json_sql_database_storage_spark import registry

registry.load_all()
_SPECS = registry.specs()


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    pdf = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    # match sources/tables.py::_load_events normalization (ns → µs)
    if pd.api.types.is_integer_dtype(pdf["ts"]):
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ns")
    pdf["ts"] = pdf["ts"].dt.floor("us")
    return pdf


def test_funnel_matches_bruteforce(spark, sf_dir):
    ev = _events_pdf(sf_dir)
    n_view = n_click = n_purch = 0
    for _, g in ev.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "ts"].min()
        if pd.isna(t1):
            continue
        n_view += 1
        t2 = g.loc[(g.event_type == "click") & (g.ts > t1), "ts"].min()
        if pd.isna(t2):
            continue
        n_click += 1
        t3 = g.loc[(g.event_type == "purchase") & (g.ts > t2), "ts"].min()
        if not pd.isna(t3):
            n_purch += 1
    row = _SPECS["window_funnel_steps"].fn(spark, sf_dir).collect()[0]
    assert (row["n_view"], row["n_view_click"], row["n_full_funnel"]) == \
        (n_view, n_click, n_purch)


def test_cdc_latest_matches_pandas(spark, sf_dir):
    ev = _events_pdf(sf_dir)
    latest = (ev.sort_values(["user_id", "event_type", "ts", "event_id"])
              .groupby(["user_id", "event_type"], as_index=False).last())
    got = {(r["user_id"], r["event_type"]):
           (r["last_ts"], r["last_event_id"], r["last_value_cents"])
           for r in _SPECS["cdc_latest_by_key"].fn(spark, sf_dir).collect()}
    assert len(got) == len(latest)
    for _, r in latest.iterrows():
        ts, eid, cents = got[(r["user_id"], r["event_type"])]
        assert pd.Timestamp(ts) == r["ts"]
        assert eid == r["event_id"]
        assert cents == round(r["value"] * 100)


def test_asof_tolerance_matches_pandas_merge_asof(spark, sf_dir):
    ev = _events_pdf(sf_dir)[["event_id", "user_id", "ts"]]
    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    o = pd.DataFrame({
        "user_id": orders["o_custkey"],
        "ts": pd.to_datetime(orders["o_orderdate"]),
        "o_orderkey": orders["o_orderkey"],
    }).sort_values(["ts", "o_orderkey"])
    merged = pd.merge_asof(
        ev.sort_values("ts"), o, on="ts", by="user_id",
        direction="backward", tolerance=pd.Timedelta(days=30))
    expect = dict(zip(merged["event_id"], merged["o_orderkey"]))
    got = {r["event_id"]: r["asof_orderkey_30d"] for r in
           _SPECS["join_asof_tolerance"].fn(spark, sf_dir).collect()}
    assert len(got) == len(expect)
    for eid, want in expect.items():
        have = got[eid]
        if pd.isna(want):
            assert have is None, (eid, have)
        else:
            assert have == want, (eid, have, want)


def test_interval_binned_matches_bruteforce(spark, sf_dir):
    """The binned equi-join rewrite must equal the direct O(n·m)
    comparison — verified here with numpy broadcasting over the same
    data, independent of both the Spark plan and the DuckDB oracle."""
    import numpy as np

    ev = _events_pdf(sf_dir)
    err = ev[ev.event_type == "error"]
    pur = ev[ev.event_type == "purchase"]
    its = err.ts.values.astype("datetime64[us]").astype("int64")
    pts = pur.ts.values.astype("datetime64[us]").astype("int64")
    hour = 3600 * 1_000_000
    mask = (pts[None, :] >= its[:, None] - hour) & \
           (pts[None, :] < its[:, None] + hour)
    ei, pi = np.nonzero(mask)
    expect = set(zip(err.event_id.values[ei], pur.event_id.values[pi]))
    got = {(r["incident_id"], r["purchase_id"]) for r in
           _SPECS["join_interval_binned"].fn(spark, sf_dir).collect()}
    assert got == expect


def test_generic_funnel_four_steps(spark, sf_dir):
    """funnel_times at a step count the registered query doesn't use:
    4-step view→click→signup→purchase vs a brute-force pandas replay."""
    from json_sql_database_storage_spark.operators.windows import funnel_times
    from json_sql_database_storage_spark.sources import load_table

    steps = ["view", "click", "signup", "purchase"]
    got = {r["user_id"]: tuple(r[f"t{i+1}"] for i in range(4))
           for r in funnel_times(
               load_table(spark, sf_dir, "events"), steps).collect()}
    ev = _events_pdf(sf_dir)
    for uid, g in ev.groupby("user_id"):
        prev = None
        expect = []
        for s in steps:
            sel = g[g.event_type == s]
            if prev is not None:
                sel = sel[sel.ts > prev]
            t = sel.ts.min()
            expect.append(None if pd.isna(t) else t)
            prev = t
            if prev is pd.NaT or pd.isna(prev):
                expect.extend([None] * (len(steps) - len(expect)))
                break
        have = got[uid]
        for h, e in zip(have, expect):
            if e is None:
                assert h is None, (uid, have, expect)
            else:
                assert pd.Timestamp(h) == e, (uid, have, expect)
