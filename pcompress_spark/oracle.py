"""Exact golden oracle for pairs + clusters (FIXTURES.md §2).

Plays the role of the reference's round-trip `diff` oracle
(/root/reference/test/integration/test_dedup.sh:71-90 and the stored-SHA256
golden archives in test/backward_compat/): an independent, brute-force-exact
computation of which documents are duplicates, against which the distributed
pipeline's recall and cluster assignments are graded.

Exactness notes:
- near-pairs use an inverted shingle index purely as a *complete* candidate
  enumerator (any pair with intersection >= 1 is counted exactly); Jaccard is
  then computed from exact intersection counts — no approximation.
- substring pairs enumerate every L0-char window hash (all offsets), so any
  shared span >= substring_min_len >= L0 is guaranteed to collide; each
  candidate is then verified by actual string comparison (hash collisions
  cannot produce false positives).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from pcompress_spark.functions import hashing as H
from pcompress_spark.xxh64 import xxh64_signed

_LCS_PROBE = 256  # candidate window width for substring detection


class _DSU:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def has_common_substring(a: str, b: str, min_len: int) -> bool:
    """Exact: do a and b share a verbatim substring of >= min_len chars?

    Rolling-hash candidate windows + direct byte comparison on hash hits
    (collisions can't produce false positives). Byte-domain (utf-8), which
    is also the domain of the shingle/window hashes.
    """
    a_bytes = a.encode("utf-8")
    b_bytes = b.encode("utf-8")
    if len(a_bytes) < min_len or len(b_bytes) < min_len:
        return False
    if len(a_bytes) > len(b_bytes):
        a_bytes, b_bytes = b_bytes, a_bytes
    ua, ia = np.unique(H.window_hashes_all(a_bytes, min_len), return_index=True)
    ub, ib = np.unique(H.window_hashes_all(b_bytes, min_len), return_index=True)
    _, ca, cb = np.intersect1d(ua, ub, assume_unique=True, return_indices=True)
    for off_a, off_b in zip(ia[ca].tolist(), ib[cb].tolist()):
        if a_bytes[off_a : off_a + min_len] == b_bytes[off_b : off_b + min_len]:
            return True
    return False


def compute_golden(
    pages: pd.DataFrame,
    shingle_width: int = 16,
    tau: float = 0.4,
    substring_min_len: int = 2048,
    cjk_shingle_chars: int = 8,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(golden_pairs, golden_clusters) for a pages frame (url, text[, lang]).

    Shingling dispatches per lang exactly like the pipeline (CJK docs in
    codepoints, others in bytes — hashing.shingles_for, the SAME function
    the sig/verify UDFs call, so oracle and engine cannot drift)."""
    urls = pages["url"].tolist()
    texts = pages["text"].tolist()
    langs = (
        pages["lang"].tolist() if "lang" in pages.columns else ["en"] * len(urls)
    )
    n = len(urls)
    doc_ids = np.array([xxh64_signed(u) for u in urls], dtype=np.int64)

    shingles = [
        H.shingles_for(t, lg, shingle_width, cjk_shingle_chars)
        for t, lg in zip(texts, langs)
    ]
    sizes = np.array([s.size for s in shingles], dtype=np.int64)

    # --- exact pairs: identical text ---
    by_text: dict[str, list[int]] = defaultdict(list)
    for i, t in enumerate(texts):
        by_text[t].append(i)
    exact_pairs: set[tuple[int, int]] = set()
    for members in by_text.values():
        if len(members) > 1:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    exact_pairs.add((members[x], members[y]))

    # --- near pairs: exact Jaccard via complete inverted index ---
    inv: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(shingles):
        for hv in sh.tolist():
            inv[hv].append(i)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for docs in inv.values():
        if len(docs) > 1:
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    inter[(docs[x], docs[y])] += 1
    near_pairs: dict[tuple[int, int], float] = {}
    for (i, j), c in inter.items():
        union = sizes[i] + sizes[j] - c
        jac = c / union if union else 0.0
        if jac >= tau and (i, j) not in exact_pairs:
            near_pairs[(i, j)] = float(jac)

    # --- substring pairs: shared >=min_len verbatim span ---
    probe_inv: dict[int, list[int]] = defaultdict(list)
    for i, t in enumerate(texts):
        for hv in np.unique(H.window_hashes_all(t.encode("utf-8"), _LCS_PROBE)).tolist():
            probe_inv[hv].append(i)
    sub_candidates: set[tuple[int, int]] = set()
    for docs in probe_inv.values():
        if 1 < len(docs) <= 64:
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    sub_candidates.add((docs[x], docs[y]))
        elif len(docs) > 64:
            # shared boilerplate probe — connect via star to bound work;
            # these pairs are near-pairs anyway (J >= tau)
            m = min(docs)
            for d in docs:
                if d != m:
                    sub_candidates.add((min(m, d), max(m, d)))
    substring_pairs: set[tuple[int, int]] = set()
    for (i, j) in sorted(sub_candidates):
        if (i, j) in exact_pairs or (i, j) in near_pairs:
            continue
        if has_common_substring(texts[i], texts[j], substring_min_len):
            substring_pairs.add((i, j))

    # --- assemble pairs frame (url_a < url_b lexicographically) ---
    rows = []

    def _jac(i: int, j: int) -> float:
        a, b = shingles[i], shingles[j]
        return H.jaccard(a, b)

    for (i, j) in sorted(exact_pairs):
        ua, ub = sorted((urls[i], urls[j]))
        rows.append((ua, ub, 1.0, "exact"))
    for (i, j), jac in sorted(near_pairs.items()):
        ua, ub = sorted((urls[i], urls[j]))
        rows.append((ua, ub, jac, "near"))
    for (i, j) in sorted(substring_pairs):
        ua, ub = sorted((urls[i], urls[j]))
        rows.append((ua, ub, _jac(i, j), "substring"))
    golden_pairs = pd.DataFrame(rows, columns=["url_a", "url_b", "jaccard", "kind"])

    # --- clusters: union-find over all dup edges, rep = min doc_id ---
    dsu = _DSU()
    for i in range(n):
        dsu.find(int(doc_ids[i]))
    for (i, j) in (
        list(exact_pairs) + list(near_pairs.keys()) + list(substring_pairs)
    ):
        dsu.union(int(doc_ids[i]), int(doc_ids[j]))
    cluster_of = {int(doc_ids[i]): dsu.find(int(doc_ids[i])) for i in range(n)}
    url_of_id = {int(doc_ids[i]): urls[i] for i in range(n)}
    crows = []
    for i in range(n):
        did = int(doc_ids[i])
        cid = cluster_of[did]
        crows.append((urls[i], did, cid, url_of_id[cid], did == cid))
    golden_clusters = pd.DataFrame(
        crows,
        columns=["url", "doc_id", "cluster_id", "representative_url", "is_representative"],
    )
    return golden_pairs, golden_clusters
