"""Z-order layout: Morton code correctness + the two-dimensional
skipping property it buys at the file level."""

from __future__ import annotations

from pyspark.sql import functions as F

from samba_tv_ingest_etl_spark.functions.zorder import bucketize, z_value


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + i)
    return out


def test_z_value_matches_python_interleave(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", z_value([F.col("x"), F.col("y")], bits=6)
    )
    for r in df.collect():
        assert r["z"] == _py_morton([r["x"], r["y"]], 6), r


def test_bucketize_clamps_and_grids(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double"
    ).select(bucketize(F.col("v"), 0, 100, 4).alias("b"))
    got = [r["b"] for r in df.collect()]
    assert got[0] == 0  # below range clamps
    assert got[1] == 0
    assert got[2] == 8  # midpoint -> middle cell
    assert got[4] == 15  # above range clamps
    assert all(0 <= b < 16 for b in got)


def test_zorder_files_bound_both_dimensions(spark, tmp_path):
    """Lexicographic sort on (x, y) leaves per-file y ranges at full
    domain width; the Morton sort bounds BOTH x and y ranges per
    file, which is exactly what lets parquet stats skip on either
    column."""
    n, files, bits = 4096, 16, 6
    base = spark.range(n).select(
        ((F.col("id") * 2654435761) % 64).alias("x"),
        ((F.col("id") * 40503) % 64).alias("y"),
    )

    from pyspark.sql import Window

    def per_file_ranges(df, sort_cols):
        # model a file as one of `files` contiguous chunks of the
        # sorted order, and measure each chunk's (x, y) spread — the
        # row-group min/max stats a reader would prune against
        chunk = F.floor(
            F.lit(files)
            * (F.row_number().over(Window.orderBy(*sort_cols)) - 1)
            / F.lit(n)
        ).alias("_f")
        return (
            df.select("x", "y", chunk)
            .groupBy("_f")
            .agg(
                (F.max("x") - F.min("x")).alias("rx"),
                (F.max("y") - F.min("y")).alias("ry"),
            )
            .collect()
        )

    lex = per_file_ranges(base, ["x", "y"])
    zed = per_file_ranges(
        base.withColumn(
            "zz", z_value([F.col("x"), F.col("y")], bits=bits)
        ),
        ["zz"],
    )
    avg = lambda rows, c: sum(r[c] for r in rows) / len(rows)  # noqa: E731
    # z-order: both dimensions bounded well below the domain width
    assert avg(zed, "rx") < 32 and avg(zed, "ry") < 32, (
        avg(zed, "rx"), avg(zed, "ry"),
    )
    # and the second sort dimension is dramatically tighter than the
    # lexicographic layout leaves it (y spans most of the domain there)
    assert avg(lex, "ry") > 1.5 * avg(zed, "ry"), (
        avg(lex, "ry"), avg(zed, "ry"),
    )
