"""Property test: asof_join agrees with pandas merge_asof (an
independent third implementation, besides DuckDB's ASOF JOIN) on
randomized inputs — keys present/absent on either side, duplicate
left timestamps, unmatched rows."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from samba_tv_ingest_etl_spark.operators.asof import asof_join

_KEYS = ["a", "b", "c"]

left_rows = st.lists(
    st.tuples(
        st.sampled_from(_KEYS),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=25,
)
right_rows = st.lists(
    st.tuples(
        st.sampled_from(_KEYS),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=999),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # unique per (key, ts)
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=left_rows, right=right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k string, ts long, lid long",
    )
    rdf = spark.createDataFrame(right, "k string, ts long, payload long")
    got = {
        r["lid"]: (r["matched_ts"], r["payload"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts"
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        right, columns=["k", "ts", "payload"]
    ).sort_values("ts", kind="stable")
    if len(rp):
        merged = pd.merge_asof(
            lp,
            rp.rename(columns={"ts": "rts"}),
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (
                None if pd.isna(r.rts) else int(r.rts),
                None if pd.isna(r.payload) else int(r.payload),
            )
            for r in merged.itertuples()
        }
    else:
        want = {int(r.lid): (None, None) for r in lp.itertuples()}
    assert got == want
