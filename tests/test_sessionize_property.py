"""Property test: the flagship sessionizer vs a 15-line pure-Python
reference on arbitrary event sets. The golden fixtures pin the known
edge cases (gap==300 stays, 301 splits, <180 dropped); this pins
everything else — including the reference's LAG(end) quirk, where the
gap compares against the PREVIOUS ROW's end, not the running max, so
an event nested inside a long predecessor can still break."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from samba_tv_ingest_etl_spark.operators.sessionize import sessionize

GAP = 30
MIN_TOTAL = 20


def _py_sessionize(events):
    """events: (event_id, user, start, dur). Mirrors the reference:
    order by (start, event_id); break when start - prev_row_end > GAP;
    aggregate; drop totals < MIN_TOTAL."""
    by_user = {}
    for e in events:
        by_user.setdefault(e[1], []).append(e)
    out = set()
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[2], e[0]))
        sessions, cur = [], None
        prev_end = None
        for eid, _u, start, dur in evs:
            if prev_end is None or start - prev_end > GAP:
                cur = [start, start + dur, dur]
                sessions.append(cur)
            else:
                cur[0] = min(cur[0], start)
                cur[1] = max(cur[1], start + dur)
                cur[2] += dur
            prev_end = start + dur
        for s in sessions:
            if s[2] >= MIN_TOTAL:
                out.add((user, s[0], s[1], s[2]))
    return out


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    return [
        (
            i,
            draw(st.integers(min_value=0, max_value=2)),     # user
            draw(st.integers(min_value=0, max_value=300)),   # start
            draw(st.integers(min_value=0, max_value=60)),    # duration
        )
        for i in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(event_sets())
def test_sessionize_matches_python_reference(spark, events):
    df = spark.createDataFrame(
        [(e[0], e[1], e[2], e[2] + e[3], e[3]) for e in events],
        ["event_id", "user_id", "start_ts", "end_ts", "duration_s"],
    )
    got = {
        (
            r["user_id"], r["session_start_ts"],
            r["session_end_ts"], r["total_duration"],
        )
        for r in sessionize(
            df,
            partition_cols=["user_id"],
            order_col="start_ts",
            end_col="end_ts",
            duration_col="duration_s",
            gap_seconds=GAP,
            min_total_duration=MIN_TOTAL,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    assert got == _py_sessionize(events)
