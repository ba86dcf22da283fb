"""Property test: SCD2 history build vs a pure-Python reference on
arbitrary (user, ts, attr) timelines — duplicates, same-ts ties and
NULL attrs included."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from samba_tv_ingest_etl_spark.operators.scd import scd2_history


def _py_scd2(rows):
    """rows: (event_id, user, ts, attr). Mirrors the operator: order
    by (ts, event_id) per user, start a run whenever attr differs
    (null-safe) from the previous row, version runs 1..n, valid_to =
    next run's valid_from."""
    by_user = {}
    for r in rows:
        by_user.setdefault(r[1], []).append(r)
    out = set()
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[2], e[0]))
        runs = []
        prev = object()  # sentinel != anything incl. None
        for _eid, _u, ts, attr in evs:
            if attr != prev or (attr is None) != (prev is None):
                runs.append([attr, ts])
            prev = attr
        for i, (attr, start) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.add((user, attr, i + 1, start, nxt))
    return out


@st.composite
def timelines(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    return [
        (
            i,
            draw(st.integers(min_value=0, max_value=2)),    # user
            draw(st.integers(min_value=0, max_value=20)),   # ts (dups likely)
            draw(st.sampled_from(["A", "B", None])),        # attr
        )
        for i in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(timelines())
def test_scd2_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, attr string"
    )
    got = {
        (
            r["user_id"], r["attr"], r["version"],
            r["valid_from"], r["valid_to"],
        )
        for r in scd2_history(
            df, keys=["user_id"], ts_col="ts", attrs=["attr"],
            tiebreak=["event_id"],
        ).collect()
    }
    assert got == _py_scd2(rows)
