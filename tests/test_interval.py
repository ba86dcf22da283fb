"""Bucketed interval join: equals the naive theta join, joins each
matching pair exactly once across bucket widths, and never plans a
nested loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators.interval import interval_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], "pid long, ts long"
    )
    ivl = spark.createDataFrame(
        [
            (1, 0, 10),
            (2, 5, 5),     # degenerate single-point interval
            (3, 8, 40),    # overlaps interval 1
            (4, 95, 120),  # hangs past the point domain
            (5, 200, 210),  # matches nothing
        ],
        "iid long, s long, e long",
    )
    return pts, ivl


def _naive(pts, ivl):
    return pts.crossJoin(ivl).filter(
        F.col("ts").between(F.col("s"), F.col("e"))
    )


def test_equals_naive_theta_join_any_width(spark):
    pts, ivl = _frames(spark)
    want = sorted(
        (r["pid"], r["iid"]) for r in _naive(pts, ivl).collect()
    )
    assert want  # non-vacuous
    for width in (1, 3, 7, 50, 1000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pts, ivl, "ts", "s", "e", bucket_width=width
            ).collect()
        )
        assert got == want, f"width={width}"


def test_no_duplicate_pairs(spark):
    pts, ivl = _frames(spark)
    out = interval_join(pts, ivl, "ts", "s", "e", bucket_width=4)
    n = out.count()
    assert out.select("pid", "iid").distinct().count() == n


def test_plan_has_no_nested_loop(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pts, ivl = _frames(spark)
        out = interval_join(pts, ivl, "ts", "s", "e", bucket_width=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan, plan
        assert "Cartesian" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_column_clash_rejected(spark):
    pts, ivl = _frames(spark)
    try:
        interval_join(
            pts, ivl.withColumnRenamed("iid", "pid"), "ts", "s", "e", 10
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
