"""CLI smoke: the operational commands drive the same plans the
oracle rows already pin; here we check wiring, not semantics."""

from __future__ import annotations

import os

import pytest

from samba_tv_ingest_etl_spark.__main__ import main

from .conftest import SF_DIR


def test_list_names_queries(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q13_session_ids" in out
    assert "q76_semdedup_drops" in out


def test_query_command_runs(capsys):
    rc = main(
        ["query", "--name", "q14_sessions", "--sf-dir", SF_DIR,
         "--limit", "3"]
    )
    assert rc == 0
    assert "session" in capsys.readouterr().out


def test_query_command_unknown_name():
    assert (
        main(["query", "--name", "q_nope", "--sf-dir", SF_DIR]) == 2
    )


@pytest.mark.parametrize("scale", [False, True])
def test_backfill_then_incremental(tmp_path, scale, spark):
    wh = os.path.join(str(tmp_path), "wh")
    argv = ["backfill", "--sf-dir", SF_DIR, "--warehouse", wh]
    argv2 = ["incremental", "--sf-dir", SF_DIR, "--warehouse", wh]
    if scale:
        argv.append("--scale-layout")
        argv2.append("--scale-layout")
    assert main(argv) == 0
    assert os.path.isdir(os.path.join(wh, "viewing_sessions"))
    n = spark.read.parquet(os.path.join(wh, "viewing_sessions")).count()
    assert n > 0
    # daily pass on top of the backfill is idempotent wiring-wise
    assert main(argv2) == 0
    n2 = spark.read.parquet(
        os.path.join(wh, "viewing_sessions")
    ).count()
    assert n2 >= 0
