#!/usr/bin/env python
"""Measure MinHash-LSH candidate linearity across scale factors.

VERDICT r5 #1: q22's sf10 wall-clock ratio (12x for 10x rows) was
explained from construction — candidates grow with rows x planted-dup
density — but never measured, and the claim breaks if duplicate
CLUSTER sizes grow with the corpus (a cluster of m docs contributes
C(m,2) candidate pairs per band). This script runs the exact q22
signature pipeline (prefix corpus -> shingles -> sha2 minhash) at each
given scale directory and prints ``lsh_band_stats`` per size: if
``candidates_per_doc`` and ``max_bucket_width`` are flat across a 10x
row growth, the band join's total cost is linear and the wall ratio
is a constant, not a quadratic term. If ``max_bucket_width`` grows
with the corpus, the ``max_bucket_width`` cap on ``minhash_lsh_pairs``
is the scale-safe fallback.

Usage:
    python tools/lsh_stats.py [DIR ...]     # default: .testdata/sf1 .testdata/sf10
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samba_tv_ingest_etl_spark.operators import dedup as D  # noqa: E402
from samba_tv_ingest_etl_spark.queries.llmdata import (  # noqa: E402
    _NGRAM,
    _prefix_corpus,
)
from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or [".testdata/sf1", ".testdata/sf10"]
    spark = get_spark("lsh-stats")
    out = {}
    from samba_tv_ingest_etl_spark.queries.llmdata import _LSH_BUCKET_CAP

    for d in dirs:
        sh = D.shingle_docs(_prefix_corpus(spark, d), ngram=_NGRAM)
        signed = D.minhash_signatures(sh, hash_mode="sha2")
        out[d] = D.lsh_band_stats(
            signed, max_bucket_width=_LSH_BUCKET_CAP
        )
        print(f"{d}: {out[d]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
