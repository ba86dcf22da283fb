"""Property tests (hypothesis) for sequence packing: for ANY token
multiset, the packed layout must tile the concatenated corpus exactly
— offsets contiguous in order, spans consistent, totals preserved."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from samba_tv_ingest_etl_spark.operators.packing import pack_sequences

SEQ = 64


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    return [
        (i, draw(st.integers(min_value=0, max_value=200)))
        for i in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_packing_tiles_the_corpus(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = sorted(
        (
            r["doc_id"], r["n_tokens"], r["start_offset"],
            r["seq_first"], r["seq_last"], r["n_seqs"],
        )
        for r in pack_sequences(df, seq_len=SEQ).collect()
    )
    nonempty = [(d, t) for d, t in rows if t > 0]
    assert len(out) == len(nonempty)
    expect_start = 0
    for (doc, n, start, first, last, nseq), (edoc, etok) in zip(
        out, nonempty
    ):
        assert (doc, n) == (edoc, etok)
        # contiguous tiling: each doc starts where the previous ended
        assert start == expect_start
        expect_start += n
        # span arithmetic
        assert first == start // SEQ
        assert last == (start + n - 1) // SEQ
        assert nseq == last - first + 1
