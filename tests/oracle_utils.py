"""Local mimic of the driver's DuckDB oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir,
sorts columns by name and rows by value, and asserts equality (exact
for ints/strings/dates, tolerant for floats).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize for sorting: render everything to strings, floats rounded
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            out[c] = col.round(6)
        else:
            # unify null spellings (None/NaT/NaN) before stringifying
            out[c] = col.astype(str).mask(col.isna(), "NULL")
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def assert_query_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from samba_tv_ingest_etl_spark import queries as Q

    fn = Q.registry()[name]
    sql = Q.oracles()[name]
    got = fn(spark, sf_dir).toPandas()
    want = run_oracle(sql, sf_dir)
    # every registered query produces rows on the fixture data; an
    # empty==empty "match" is vacuous and has hidden a real bug (a
    # filter constant that matched nothing). Allowlist here if a
    # legitimately-empty query ever appears.
    assert len(got) > 0, f"{name}: empty result — vacuous oracle match"
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = _norm(got), _norm(want)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            bad = [
                (a, b)
                for a, b in zip(g[c], w[c])
                if not (
                    (pd.isna(a) and pd.isna(b))
                    or (not pd.isna(a) and not pd.isna(b) and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9))
                )
            ]
            assert not bad, f"{name}.{c}: {len(bad)} float mismatches, first: {bad[:3]}"
        else:
            mism = g[c][g[c] != w[c]]
            assert mism.empty, (
                f"{name}.{c}: {len(mism)} mismatches, first rows:\n"
                f"spark: {g[c][g[c] != w[c]].head(3).tolist()}\n"
                f"oracle: {w[c][g[c] != w[c]].head(3).tolist()}"
            )
