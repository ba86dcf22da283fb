"""Run every registered query against the DuckDB oracle at sf0.001 —
a local mimic of the driver's CORRECTNESS gate (it runs at sf0.01)."""

from __future__ import annotations

import pytest

from samba_tv_ingest_etl_spark import queries as Q

from .conftest import SF_DIR_ORACLE
from .oracle_utils import assert_query_matches_oracle


def _keys():
    return sorted(Q.oracles().keys())


@pytest.mark.parametrize("name", _keys())
def test_query_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name, SF_DIR_ORACLE)


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_every_query_has_registry_entry(spark):
    # every oracle key must have a query fn (inverse is allowed:
    # non-SQL-expressible ops may omit the oracle)
    q = Q.registry()
    for k in Q.oracles():
        assert k in q
