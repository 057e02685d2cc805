"""ANN recall certificate: the LSH bucket machinery must retrieve every
strong (cos >= 0.4) pair of the fixed test corpus — the recall lower
bound the driver oracle asserts (closes the r2 `no_oracle` row)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def test_ann_recall_certificate_covers_all_strong_pairs(spark):
    """The b=3/T=24 certificate config must retrieve EVERY strong pair
    (cos >= 0.4) of the test corpus — the recall lower bound the driver
    oracle asserts."""
    from pcompress_spark.analysis.embeddings import ann_recall_certify

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ann_recall_certify(emb, 0.4, bits=3, tables=24).collect()
    assert len(out) > 0
    missed = [(r.id_a, r.id_b) for r in out if not r.retrieved]
    assert missed == []


def test_ann_recall_uses_same_bucket_machinery(spark):
    """The certificate and lsh_ann_topk must share bucket candidates: any
    undirected certificate pair retrieved implies mutual top-k candidacy
    when k is unbounded."""
    from pcompress_spark.analysis import embeddings as E

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    und = E.lsh_bucket_candidates(emb, 3, 24, directed=False)
    dir_ = E.lsh_bucket_candidates(emb, 3, 24, directed=True)
    u = {(r.id_a, r.id_b) for r in und.collect()}
    d = {(r.id_a, r.id_b) for r in dir_.collect()}
    assert all((a, b) in d and (b, a) in d for a, b in u)
    assert len(d) == 2 * len(u)
