"""As-of join: semantics pinned on a hand-built frame (inclusive
match, unmatched-left nulls, tolerance, inner), plus a plan assertion
that the operator costs one shuffle, not a per-key cross product."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("a", 5, 100),
            ("a", 10, 101),  # ties a right row at ts=10 -> inclusive
            ("a", 3, 102),   # before any right row -> unmatched
            ("b", 7, 103),
            ("c", 9, 104),   # key with no right rows at all
        ],
        "k string, ts long, event_id long",
    )
    right = spark.createDataFrame(
        [
            ("a", 4, "r4"),
            ("a", 10, "r10"),
            ("b", 1, "r1"),
            ("b", 6, "r6"),
        ],
        "k string, ts long, state string",
    )
    return left, right


def test_asof_left_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts"
    )
    got = {
        r["event_id"]: (r["matched_ts"], r["state"])
        for r in out.collect()
    }
    assert got == {
        100: (4, "r4"),
        101: (10, "r10"),  # inclusive at equality
        102: (None, None),  # left row precedes all right rows
        103: (6, "r6"),
        104: (None, None),  # key absent on the right
    }
    assert out.count() == left.count()


def test_asof_tolerance_and_inner(spark):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        how="inner",
        tolerance=1,
    )
    got = {
        r["event_id"]: (r["matched_ts"], r["state"])
        for r in out.collect()
    }
    # only matches aged <= 1 tick survive: 100 (5-4), 101 (10-10),
    # 103 (7-6); unmatched/stale left rows drop under how="inner"
    assert got == {
        100: (4, "r4"),
        101: (10, "r10"),
        103: (6, "r6"),
    }


def test_asof_matches_duckdb_asof_join(spark):
    import duckdb

    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts"
    ).select("event_id", "matched_ts", "state")
    con = duckdb.connect()
    lp, rp = left.toPandas(), right.toPandas()
    con.register("l", lp)
    con.register("r", rp)
    want = con.execute(
        """SELECT l.event_id, r.ts AS matched_ts, r.state
           FROM l ASOF LEFT JOIN r
             ON l.k = r.k AND l.ts >= r.ts"""
    ).fetchall()
    assert sorted(map(tuple, out.collect())) == sorted(want)


def test_asof_plan_is_single_shuffle_per_side(spark):
    """The union+window plan must shuffle each side once on the key —
    no join-exchange on (key, ts) pairs, no nested-loop. Window over
    the union == 1 hashpartitioning(k) exchange total (the union is
    partition-local)."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("hashpartitioning") <= 1, plan
