"""Regenerate the committed golden fixtures (FIXTURES.md §2).

Deterministic: datagen is a pure function of (seed=42, index) and the
oracle is exact, so regeneration reproduces the committed parquet
byte-identically unless the pipeline's *semantic config* changed (e.g.
per-lang shingle dispatch) — in which case rerun this and commit the diff
alongside the engine change that caused it.

Usage: python scripts/gen_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcompress_spark import datagen, oracle  # noqa: E402

FIXTURES = os.path.join(REPO, "fixtures")
N = 1000


def main() -> None:
    pdf = datagen.gen_pages_pandas(N)
    # pin the input corpus — same hash recipe as
    # tests/test_datagen.py::test_pages_regeneration_byte_identical
    h = hashlib.sha256()
    for t in pdf["text"]:
        h.update(t.encode())
    for u in pdf["url"]:
        h.update(u.encode())
    for b in pdf["html"]:
        h.update(b)
    with open(os.path.join(FIXTURES, f"pages_n{N}.sha256"), "w") as fh:
        fh.write(h.hexdigest() + "\n")

    pairs, clusters = oracle.compute_golden(pdf)
    pairs.to_parquet(
        os.path.join(FIXTURES, f"golden_pairs_n{N}.parquet"), index=False
    )
    clusters.to_parquet(
        os.path.join(FIXTURES, f"golden_clusters_n{N}.parquet"), index=False
    )
    print(
        f"wrote {len(pairs)} golden pairs "
        f"({pairs['kind'].value_counts().to_dict()}), "
        f"{clusters['cluster_id'].nunique()} clusters for {N} docs"
    )


if __name__ == "__main__":
    main()
