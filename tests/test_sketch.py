"""KMV sketch: estimator accuracy when saturated, exactness when
unsaturated, and the merge == rescan identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.operators import sketch as SK

from .conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_unsaturated_sketch_is_exact(spark):
    ev = _events(spark)
    sk = SK.kmv_sketch(ev, ["event_type"], "user_id", k=10_000)
    est = sk.select(
        "event_type",
        SK.kmv_estimate("kth_min_hash", "sketch_size", 10_000).alias(
            "est"
        ),
    )
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in est.collect():
        assert r["est"] == float(exact[r["event_type"]])


def test_saturated_estimate_within_tolerance(spark):
    ev = _events(spark)  # event_id: one distinct hash per row
    k = 128
    sk = SK.kmv_sketch(ev, [], "event_id", k=k)
    row = sk.select(
        SK.kmv_estimate("kth_min_hash", "sketch_size", k).alias("est")
    ).collect()[0]
    exact = ev.select("event_id").distinct().count()
    assert exact > k  # saturated regime, or the test is vacuous
    # KMV stderr ~ 1/sqrt(k-2) ~ 9% at k=128; allow 3 sigma
    assert abs(row["est"] - exact) / exact < 0.27, (row["est"], exact)


def test_merge_equals_rescan(spark):
    ev = _events(spark)
    k = 64
    per = SK.kmv_sketch(ev, ["event_type"], "event_id", k=k)
    merged = SK.kmv_merge(per, keys=[], k=k).collect()[0]
    direct = SK.kmv_sketch(ev, [], "event_id", k=k).collect()[0]
    assert merged["sketch"] == direct["sketch"]
    assert merged["kth_min_hash"] == direct["kth_min_hash"]


def test_prefilter_exact_when_enough_survivors(spark):
    ev = _events(spark)
    k = 64
    full = SK.kmv_sketch(ev, [], "event_id", k=k).collect()[0]
    # any threshold above the observed kth keeps the result identical
    pre = SK.kmv_sketch(
        ev, [], "event_id", k=k, prefilter=full["kth_min_hash"] + 1
    ).collect()[0]
    assert pre["sketch"] == full["sketch"]


def test_histogram_merge_equals_rescan(spark):
    """Histograms over disjoint halves, merged, == histogram of the
    whole — and the quantile estimates agree exactly."""
    from samba_tv_ingest_etl_spark.operators import sketch as SK
    from pyspark.sql import functions as F

    ev = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("grp"),
        ((F.col("id") * 37) % 1000 - 200).alias("cents"),
    )
    probs = [("p50", 1, 2), ("p99", 99, 100)]
    whole = SK.histogram_sketch(ev, ["grp"], "cents", bin_width=50)
    h1 = SK.histogram_sketch(
        ev.filter(F.col("id") < 2500), ["grp"], "cents", bin_width=50
    )
    h2 = SK.histogram_sketch(
        ev.filter(F.col("id") >= 2500), ["grp"], "cents", bin_width=50
    )
    merged = SK.histogram_merge(h1.unionByName(h2), ["grp"])
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b
    qa = sorted(tuple(r) for r in SK.histogram_quantile_bins(
        whole, ["grp"], 50, probs).collect())
    qb = sorted(tuple(r) for r in SK.histogram_quantile_bins(
        merged, ["grp"], 50, probs).collect())
    assert qa == qb


def test_histogram_quantile_within_bin_of_exact(spark):
    """The estimate is the lower edge of the bin holding the exact
    rank-statistic value: exact_p - bin_width < estimate <= exact_p."""
    from samba_tv_ingest_etl_spark.operators import sketch as SK
    from pyspark.sql import functions as F

    w = 50
    vals = [((i * 131) % 2000) - 300 for i in range(1, 1001)]
    ev = spark.createDataFrame([(v,) for v in vals], "cents long")
    hist = SK.histogram_sketch(ev, [], "cents", bin_width=w)
    out = SK.histogram_quantile_bins(
        hist, [], w, [("p50", 1, 2), ("p90", 9, 10)]
    ).collect()[0]
    sv = sorted(vals)
    import math
    for alias, num, den in [("p50", 1, 2), ("p90", 9, 10)]:
        exact = sv[math.ceil(len(sv) * num / den) - 1]
        est = out[alias]
        assert est <= exact < est + w, (alias, est, exact)


def test_histogram_negative_values_floor_bin(spark):
    """-1 cents lands in bin -1 (floor), not bin 0 (truncation)."""
    from samba_tv_ingest_etl_spark.operators import sketch as SK

    ev = spark.createDataFrame(
        [(-1,), (-50,), (0,), (49,)], "cents long"
    )
    rows = {
        r["bin"]: r["n"]
        for r in SK.histogram_sketch(ev, [], "cents", 50).collect()
    }
    assert rows == {-1: 2, 0: 2}


def test_histogram_quantile_property():
    """Hypothesis: for arbitrary integer data and bin widths, the
    estimate is always the floor-bin edge of the exact rank value."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from .conftest import SF_DIR  # noqa: F401  (fixture parity import)

    @st.composite
    def cases(draw):
        vals = draw(
            st.lists(
                st.integers(min_value=-500, max_value=500),
                min_size=1,
                max_size=60,
            )
        )
        w = draw(st.sampled_from([1, 7, 50]))
        return vals, w

    from samba_tv_ingest_etl_spark.operators import sketch as SK
    from samba_tv_ingest_etl_spark.session import get_spark

    spark = get_spark("tests")

    @settings(max_examples=10, deadline=None)
    @given(cases())
    def inner(case):
        vals, w = case
        ev = spark.createDataFrame([(v,) for v in vals], "cents long")
        hist = SK.histogram_sketch(ev, [], "cents", bin_width=w)
        out = SK.histogram_quantile_bins(
            hist, [], w, [("p50", 1, 2), ("p90", 9, 10)]
        ).collect()[0]
        sv = sorted(vals)
        for alias, num, den in [("p50", 1, 2), ("p90", 9, 10)]:
            exact = sv[math.ceil(len(sv) * num / den) - 1]
            est = out[alias]
            # estimate = lower edge of the exact value's bin
            assert est == (exact // w) * w, (alias, est, exact, w)

    inner()
