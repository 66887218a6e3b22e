"""asof_join against DuckDB's native ASOF JOIN (exact oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from oxigraph_spark.streaming.events import asof_join


def _mk(rng, n, n_keys, vcol):
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "t": pd.to_datetime(rng.choice(np.arange(1_700_000_000, 1_700_050_000,
                                                 7), n, replace=False),
                            unit="s"),
        vcol: rng.integers(0, 1000, n),
    })


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(42)
    lpd = _mk(rng, 300, 8, "lv")
    rpd = _mk(rng, 200, 8, "rv")
    return (spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            lpd, rpd)


def _oracle(lpd, rpd, op):
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    return con.execute(f"""
        SELECT l.k, l.t, l.lv, r.rv, r.t AS rt
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t {op} r.t
        ORDER BY l.k, l.t""").fetchall()


def _got(df):
    return [(r["k"], r["t"], r["lv"], r["rv"], r["rt"])
            for r in df.orderBy("k", "t").collect()]


def test_asof_backward_matches_duckdb(spark, frames):
    l, r, lpd, rpd = frames
    out = asof_join(l, r.withColumnRenamed("t", "rt0"), on="k",
                    left_time="t", right_time="rt0",
                    right_cols=["rv", "rt0"])
    got = [(x["k"], x["t"], x["lv"], x["rv"], x["rt0"])
           for x in out.orderBy("k", "t").collect()]
    assert got == _oracle(lpd, rpd, ">=")


def test_asof_forward_matches_duckdb(spark, frames):
    l, r, lpd, rpd = frames
    out = asof_join(l, r.withColumnRenamed("t", "rt0"), on="k",
                    left_time="t", right_time="rt0",
                    direction="forward", right_cols=["rv", "rt0"])
    got = [(x["k"], x["t"], x["lv"], x["rv"], x["rt0"])
           for x in out.orderBy("k", "t").collect()]
    assert got == _oracle(lpd, rpd, "<=")


def test_asof_tolerance(spark, frames):
    l, r, lpd, rpd = frames
    out = asof_join(l, r.withColumnRenamed("t", "rt0"), on="k",
                    left_time="t", right_time="rt0",
                    tolerance="5 minutes", right_cols=["rv", "rt0"])
    got = {(x["k"], x["t"]): (x["rv"], x["rt0"])
           for x in out.collect()}
    # oracle: backward match voided when further than 300s
    for k, t, lv, rv, rtime in _oracle(lpd, rpd, ">="):
        if rtime is not None and (t - rtime).total_seconds() > 300:
            rv, rtime = None, None
        assert got[(k, t)] == (rv, rtime)


def test_asof_equal_time_inclusive_and_suffix(spark):
    l = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")], "k int, t int, v string")
    r = spark.createDataFrame(
        [(1, 100, "x"), (1, 40, "y")], "k int, t int, v string")
    out = asof_join(l, r, on="k", left_time="t")
    got = {(x["k"], x["t"]): x["v_r"] for x in out.collect()}
    # rt == lt matches (inclusive); column name collision suffixed
    assert got == {(1, 100): "x", (1, 50): "y", (2, 10): None}
    fwd = asof_join(l, r, on="k", left_time="t", direction="forward")
    gf = {(x["k"], x["t"]): x["v_r"] for x in fwd.collect()}
    assert gf == {(1, 100): "x", (1, 50): "x", (2, 10): None}


def test_asof_validates_and_plan(spark):
    l = spark.createDataFrame([(1, 1, 1)], "k int, t int, v int")
    with pytest.raises(ValueError):
        asof_join(l, l, on="k", left_time="t", direction="sideways")
    # one exchange for the union'd window, no join operator at all
    out = asof_join(l, l, on="k", left_time="t", right_cols=["v"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_asof_nearest_matches_python(spark, frames):
    """nearest = closer of backward/forward, ties -> backward; derived
    oracle from the two DuckDB directional joins."""
    l, r, lpd, rpd = frames
    out = asof_join(l, r.withColumnRenamed("t", "rt0"), on="k",
                    left_time="t", right_time="rt0",
                    direction="nearest", right_cols=["rv", "rt0"])
    got = {(x["k"], x["t"]): (x["rv"], x["rt0"])
           for x in out.collect()}
    back = {(k, t): (rv, rtime)
            for k, t, lv, rv, rtime in _oracle(lpd, rpd, ">=")}
    fwd = {(k, t): (rv, rtime)
           for k, t, lv, rv, rtime in _oracle(lpd, rpd, "<=")}
    for key in back:
        t = key[1]
        b, f = back[key], fwd[key]
        if b[1] is None:
            want = f
        elif f[1] is None:
            want = b
        else:
            db = (t - b[1]).total_seconds()
            df_ = (f[1] - t).total_seconds()
            want = f if df_ < db else b
        assert got[key] == want, key


def test_asof_null_left_time_never_matches(spark):
    l = spark.createDataFrame([(1, None, "x"), (1, 50, "y")],
                              "k int, t int, v string")
    r = spark.createDataFrame([(1, 40, "m")], "k int, t int, w string")
    for d in ("backward", "forward", "nearest"):
        got = {x["v"]: x["w"]
               for x in asof_join(l, r, on="k", left_time="t",
                                  direction=d, right_cols=["w"]).collect()}
        assert got["x"] is None, d          # null time: no match, row kept
        assert got["y"] == ("m" if d != "forward" else None), d


def test_asof_nearest_tolerance(spark):
    l = spark.createDataFrame([(1, 100, "x")], "k int, t int, v string")
    r = spark.createDataFrame(
        [(1, 40, "far-back"), (1, 1000, "far-fwd")],
        "k int, t int, w string")
    # both candidates outside a 30s tolerance -> no match
    out = asof_join(l, r, on="k", left_time="t", direction="nearest",
                    tolerance="30 seconds", right_cols=["w"])
    assert out.collect()[0]["w"] is None
    # backward inside, forward outside -> backward wins
    out2 = asof_join(l, r, on="k", left_time="t", direction="nearest",
                     tolerance="1 minute", right_cols=["w"])
    assert out2.collect()[0]["w"] == "far-back"


def test_asof_events_table(spark, sf_dir):
    """Attribution shape over the real events table: each click joined
    to the same user's latest prior view."""
    from oxigraph_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    types = [r["event_type"] for r in
             ev.select("event_type").distinct().collect()]
    a, b = sorted(types)[:2]
    clicks = ev.where(ev["event_type"] == a)
    views = ev.where(ev["event_type"] == b) \
              .select("user_id", "ts", "event_id")
    out = asof_join(clicks, views, on="user_id", left_time="ts",
                    right_cols=["event_id", "ts"])
    assert out.count() == clicks.count()          # LEFT semantics
    sample = out.where(out["ts_r"].isNotNull())
    bad = sample.where(sample["ts_r"] > sample["ts"]).count()
    assert bad == 0                               # never in the future


def test_asof_random_differential(spark):
    """Multi-seed fuzz: random key/time frames with duplicate left
    times, both directions, against DuckDB's native ASOF join."""
    rng = np.random.default_rng(99)
    for trial in range(3):
        nl = int(rng.integers(20, 120))
        nr = int(rng.integers(10, 80))
        nk = int(rng.integers(2, 6))
        lpd = pd.DataFrame({
            "k": rng.integers(0, nk, nl),
            "t": pd.to_datetime(rng.integers(1_000, 9_000, nl), unit="s"),
            "lv": np.arange(nl),
        })
        # right times unique per key so the asof pick is deterministic
        rpd = pd.DataFrame({
            "k": rng.integers(0, nk, nr),
            "t": pd.to_datetime(rng.choice(
                np.arange(1_000, 9_000, 3), nr, replace=False), unit="s"),
            "rv": np.arange(nr),
        }).drop_duplicates(["k", "t"])
        l = spark.createDataFrame(lpd)
        r = spark.createDataFrame(rpd).withColumnRenamed("t", "rt0")
        for d, op in (("backward", ">="), ("forward", "<=")):
            out = asof_join(l, r, on="k", left_time="t", right_time="rt0",
                            direction=d, right_cols=["rv", "rt0"])
            got = sorted(((x["k"], x["t"], x["lv"], x["rv"], x["rt0"])
                          for x in out.collect()), key=repr)
            con = duckdb.connect()
            con.register("l", lpd)
            con.register("r", rpd)
            want = sorted(con.execute(f"""
                SELECT l.k, l.t, l.lv, r.rv, r.t
                FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t {op} r.t
            """).fetchall(), key=repr)
            assert got == want, (trial, d)
