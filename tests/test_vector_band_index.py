"""Persisted vector-grain LSH band index (banded ANN at rest): the
at-rest probe must be bit-identical to the inline
``topk_lsh_banded`` (per-row deterministic signatures), appends must
equal a wholesale write, a duplicate (replayed) append must be
result-neutral for the probe, and the bands/ scan must carry the
probe's key literals as pushed filters over the band-partitioned,
key-sorted layout."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from samba_tv_ingest_etl_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return (
        S.quantize(spark.read.parquet(SF_DIR + "/embeddings.parquet"))
        .filter(F.col("norm2") > 0)
        .localCheckpoint(eager=True)
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["cand_id"], r["rank"], r["cos_scaled"])
        for r in df.collect()
    )


def test_indexed_probe_matches_inline(spark, tmp_path):
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    inline = S.topk_lsh_banded(q, probes, k=10)
    path = str(tmp_path / "vband")
    S.write_vector_band_index(q, path)
    indexed = S.topk_lsh_banded_indexed(spark, path, probes, k=10)
    got = _rows(indexed)
    assert got == _rows(inline) and len(got) > 0


def test_append_equals_wholesale(spark, tmp_path):
    """Hyperplane bits are a pure per-row function of the plane
    seed, so write(part1) + append(part2) must be bit-identical to
    write(whole) — the increments≡wholesale property, ported from
    the MinHash/IVF indexes."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    whole = str(tmp_path / "whole")
    S.write_vector_band_index(q, whole)
    parts = str(tmp_path / "parts")
    S.write_vector_band_index(q.filter(F.col("vec_id") % 2 == 0), parts)
    S.append_vector_band_index(q.filter(F.col("vec_id") % 2 == 1), parts)
    got = S.topk_lsh_banded_indexed(spark, parts, probes, k=10)
    want = S.topk_lsh_banded_indexed(spark, whole, probes, k=10)
    assert _rows(got) == _rows(want)


def test_probe_neutral_to_replayed_append(spark, tmp_path):
    """A retried append duplicates rows in both docs/ and bands/;
    the probe's distinct-candidates + max(cos)-per-pair collapse
    must rank as if the append ran once."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 10)
    once = str(tmp_path / "once")
    batch = q.filter(F.col("vec_id") % 2 == 1)
    S.write_vector_band_index(q.filter(F.col("vec_id") % 2 == 0), once)
    S.append_vector_band_index(batch, once)
    want = _rows(S.topk_lsh_banded_indexed(spark, once, probes, k=10))

    twice = str(tmp_path / "twice")
    S.write_vector_band_index(q.filter(F.col("vec_id") % 2 == 0), twice)
    S.append_vector_band_index(batch, twice)
    S.append_vector_band_index(batch, twice)  # the replay
    got = _rows(S.topk_lsh_banded_indexed(spark, twice, probes, k=10))
    assert got == want


def test_probe_pushes_key_literals(spark, tmp_path):
    """The probe's collected key set must reach the bands/ scan as a
    pushed data filter — with the per-band files key-sorted, that is
    what turns the scan into row-group-pruned bucket reads instead
    of a full pass."""
    q = _corpus(spark)
    probes = q.filter(F.col("vec_id") < 2)
    path = str(tmp_path / "vband")
    S.write_vector_band_index(q, path)
    plan = (
        S.topk_lsh_banded_indexed(spark, path, probes, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PushedFilters: \[[^\]]*[Ii]n\(key", plan), (
        plan[:2000]
    )


def _decon_sides(spark):
    """q123's planting shape: eval vectors re-appear verbatim in the
    corpus (offset ids), so the τ=0.8 regime has guaranteed hits."""
    q = _corpus(spark)
    is_eval = F.col("vec_id") % 7 == 0
    ev = q.filter(is_eval)
    corp = q.filter(~is_eval).unionByName(
        ev.select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
            "q",
            "norm2",
        )
    )
    return corp.localCheckpoint(eager=True), ev


def test_decon_indexed_matches_inline(spark, tmp_path):
    """The at-rest decontamination pass (payload band index, scored
    in-join) must be byte-identical to the inline corpus-signing
    path — per-row deterministic signatures, shared banding math."""
    corp, ev = _decon_sides(spark)
    inline = S.contamination_matches_lsh(
        corp, ev, threshold_pct=80, planes=32, bands=4
    )
    path = str(tmp_path / "vband")
    S.write_vector_band_index(
        corp, path, planes=32, bands=4, band_payload=True
    )
    indexed = S.contamination_matches_lsh_indexed(
        spark, path, ev, threshold_pct=80, planes=32, bands=4
    )
    key = lambda r: (r["vec_id"], r["eval_id"], r["cos_scaled"])  # noqa: E731
    got = sorted(map(key, indexed.collect()))
    assert got == sorted(map(key, inline.collect())) and len(got) > 0


def test_decon_requires_payload_layout(spark, tmp_path):
    """A slim index (probe layout) must be rejected with a named
    error, not a missing-column surprise mid-plan."""
    import pytest

    corp, ev = _decon_sides(spark)
    path = str(tmp_path / "slim")
    S.write_vector_band_index(corp, path, planes=32, bands=4)
    with pytest.raises(ValueError, match="band_payload"):
        S.contamination_matches_lsh_indexed(
            spark, path, ev, planes=32, bands=4
        )


def test_append_rejects_layout_mismatch(spark, tmp_path):
    """planes/bands/band_payload are the index's IDENTITY (persisted
    in meta/, r11 advice): an append at a mismatched layout must
    raise a named error instead of mixing schemas or key widths in
    one bands/ directory (which a sampled footer would resolve
    arbitrarily — silently null payloads or empty wrong-width
    joins)."""
    import pytest

    q = _corpus(spark)
    half1 = q.filter(F.col("vec_id") % 2 == 0)
    half2 = q.filter(F.col("vec_id") % 2 == 1)
    slim = str(tmp_path / "slim")
    S.write_vector_band_index(half1, slim, planes=32, bands=4)
    with pytest.raises(ValueError, match="identity"):
        S.append_vector_band_index(
            half2, slim, planes=32, bands=4, band_payload=True
        )
    with pytest.raises(ValueError, match="identity"):
        S.append_vector_band_index(half2, slim, planes=48, bands=16)
    payload = str(tmp_path / "payload")
    S.write_vector_band_index(
        half1, payload, planes=32, bands=4, band_payload=True
    )
    with pytest.raises(ValueError, match="identity"):
        S.append_vector_band_index(half2, payload, planes=32, bands=4)


def test_append_schema_sniff_without_meta(spark, tmp_path):
    """A pre-meta index (or a crash before the meta write) still
    rejects a slim-vs-payload mismatch via the existing bands/
    schema — one sampled footer, the degraded check the advice
    asked for."""
    import shutil

    import pytest

    q = _corpus(spark)
    path = str(tmp_path / "premeta")
    S.write_vector_band_index(
        q.filter(F.col("vec_id") % 2 == 0), path, planes=32, bands=4,
        band_payload=True,
    )
    shutil.rmtree(path + "/meta")
    with pytest.raises(ValueError, match="slim|payload"):
        S.append_vector_band_index(
            q.filter(F.col("vec_id") % 2 == 1), path,
            planes=32, bands=4,
        )


def test_probe_rejects_width_mismatch(spark, tmp_path):
    """A probe at the wrong planes/bands would join 3-bit keys
    against 8-bit keys and return silently empty/partial top-k —
    the identity check turns that into a named error."""
    import pytest

    q = _corpus(spark)
    path = str(tmp_path / "vband")
    S.write_vector_band_index(q, path, planes=48, bands=16)
    with pytest.raises(ValueError, match="identity"):
        S.topk_lsh_banded_indexed(
            spark, path, q.filter(F.col("vec_id") < 2),
            planes=32, bands=4,
        )


def test_decon_neutral_to_replayed_append(spark, tmp_path):
    """Duplicate posting-list rows from a retried append re-derive
    identical cos per (corpus, eval) pair, so the per-corpus argmax
    is unaffected — no extra dedup pass needed or wanted."""
    corp, ev = _decon_sides(spark)
    half1 = corp.filter(F.col("vec_id") % 2 == 0)
    half2 = corp.filter(F.col("vec_id") % 2 == 1)
    once = str(tmp_path / "once")
    S.write_vector_band_index(
        half1, once, planes=32, bands=4, band_payload=True
    )
    S.append_vector_band_index(
        half2, once, planes=32, bands=4, band_payload=True
    )
    key = lambda r: (r["vec_id"], r["eval_id"], r["cos_scaled"])  # noqa: E731
    want = sorted(
        map(
            key,
            S.contamination_matches_lsh_indexed(
                spark, once, ev, planes=32, bands=4
            ).collect(),
        )
    )
    twice = str(tmp_path / "twice")
    S.write_vector_band_index(
        half1, twice, planes=32, bands=4, band_payload=True
    )
    S.append_vector_band_index(
        half2, twice, planes=32, bands=4, band_payload=True
    )
    S.append_vector_band_index(  # the replay
        half2, twice, planes=32, bands=4, band_payload=True
    )
    got = sorted(
        map(
            key,
            S.contamination_matches_lsh_indexed(
                spark, twice, ev, planes=32, bands=4
            ).collect(),
        )
    )
    assert got == want


def test_rebandable_without_resign(spark, tmp_path):
    """docs/ persists the full bucket signature, so a re-band to a
    different band count needs no re-sign: banding the persisted
    bucket must equal signing fresh and banding at the new count."""
    q = _corpus(spark)
    path = str(tmp_path / "vband")
    S.write_vector_band_index(q, path, planes=48, bands=16)
    docs, _ = S.read_vector_band_index(spark, path)
    rebanded = S._vector_bands(docs, planes=48, bands=8)
    fresh = S._vector_bands(S.lsh_buckets(q, 48, 64), planes=48, bands=8)
    key = lambda r: (r["vec_id"], r["band"], r["key"])  # noqa: E731
    assert sorted(map(key, rebanded.collect())) == sorted(
        map(key, fresh.collect())
    )
