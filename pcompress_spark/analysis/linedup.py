"""Cross-document line/paragraph dedup and corpus-mix rollups.

Line-level exact dedup is the web-curation op BETWEEN url-dedup (tier 0,
analysis/webtext.py) and whole-document dedup (operators/exact.py): the
same boilerplate line (nav bars, cookie banners, license footers) recurs
across millions of otherwise-distinct pages, and C4/RefinedWeb/Dolma all
strip a line when an identical line occurred elsewhere in the corpus,
keeping the FIRST occurrence. This is the reference's global identity
dedup applied one granularity below the document — the same
global-hash-index probe (rabin/global/index.c:485-558) with a line in
the role of a rabin block, and first-occurrence-wins exactly like the
reference's backward-ref rule (rabin/rabin_dedup.c:1606-1615: later
blocks point at the earliest identical block).

Scale shape (what must survive 100 TB):
  - one explode (doc -> lines, pure codegen, no Python);
  - ONE shuffle keyed by the line itself for first-occurrence: groupBy
    line -> min(struct(doc_id, pos)). Map-side partial aggregation
    collapses every hot boilerplate line to ONE row per map partition
    before the exchange, so a line occurring 10^9 times ships O(#maps)
    rows, not 10^9 — the skew story needs no salting;
  - one join back on the same key (AQE plans it; the build side is
    |distinct lines|). At 10^12 docs the join back is the expensive
    half; the lossy alternative (Dolma's bloom filter over line hashes)
    trades it for a broadcast probe and is noted, not default — this
    module is the exact path.

Mixture reweighting (`mix_weights`) is the sampling side of curation:
given per-source token mass, emit the up/down-sampling weight that moves
the corpus to a target mix (uniform by default) — the knob every
training-data pipeline turns after dedup/quality gating. All fractions
are 1e-6-floor-rounded (webtext._frac6 pattern) so both engines emit
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pcompress_spark.analysis.webtext import _frac6

# token-block width for newline-free corpora (see doc_lines): 12 tokens
# approximates one clause/sentence — wide enough that a block collision
# means real shared boilerplate, narrow enough to catch sub-document
# repetition the whole-doc sha misses.
DEFAULT_BLOCK_TOKENS = 12


def doc_lines(
    docs: DataFrame,
    text_col: str = "text",
    mode: str = "newline",
    block_tokens: int = DEFAULT_BLOCK_TOKENS,
) -> DataFrame:
    """(doc_id, pos, line) — deterministic line split, pure codegen.

    mode="newline": split on '\\n' (the C4/RefinedWeb unit). Web pages
    carry natural line structure; this is the production default.
    mode="token_block": fixed blocks of `block_tokens` whitespace tokens —
    for corpora whose extraction collapsed newlines (the synthetic
    documents table), where '\\n'-splitting would degenerate to
    whole-document dedup. Tokens = '\\s+' split of trim(text), identical
    in Spark and DuckDB (both engines yield [''] for empty text, so the
    degenerate block is consistent too).
    """
    if mode == "newline":
        lines = F.split(F.col(text_col), "\n")
    elif mode == "token_block":
        ws = F.split(F.trim(F.col(text_col)), r"\s+")
        bt = int(block_tokens)
        nblk = F.ceil(F.size(ws) / F.lit(float(bt))).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), nblk - 1),
            lambda i: F.array_join(F.slice(ws, i * bt + 1, bt), " "),
        )
    else:
        raise ValueError(f"doc_lines: unknown mode {mode!r}")
    return docs.select(
        "doc_id", F.posexplode(lines).alias("pos", "line")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "line")


def first_occurrence(lines: DataFrame) -> DataFrame:
    """lines(doc_id, pos, line) -> + keep:boolean.

    keep is true iff (doc_id, pos) is the corpus-wide first occurrence of
    this exact line (min by doc_id, then pos — the reference's
    earliest-block-wins backref orientation). Exact: grouped by the line
    STRING, not a 64-bit hash, so no collision can merge two distinct
    lines; map-side combine keeps hot lines from concentrating a
    partition (see module docstring)."""
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first")
    )
    return (
        lines.join(firsts, "line")
        .withColumn(
            "keep",
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("pos") == F.col("_first.pos")),
        )
        .drop("_first")
        .select("doc_id", "pos", "line", "keep")
    )


def line_dedup_docs(
    docs: DataFrame,
    text_col: str = "text",
    mode: str = "newline",
    block_tokens: int = DEFAULT_BLOCK_TOKENS,
) -> DataFrame:
    """Per-document rollup of corpus-wide line dedup:

      (doc_id, n_lines, n_kept, n_removed, text_dedup)

    text_dedup = the document's surviving lines in original order —
    what a curation pipeline would feed downstream. Docs whose every
    line was seen earlier collapse to '' (never null, so both engines
    hash identically)."""
    marked = first_occurrence(doc_lines(docs, text_col, mode, block_tokens))
    sep = "\n" if mode == "newline" else " "
    kept_lines = F.array_sort(
        F.collect_list(
            F.when(F.col("keep"), F.struct("pos", "line"))
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept_lines, lambda s: s["line"]), sep
        ).alias("text_dedup"),
    )


def mix_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus composition + the resampling weight to a uniform
    target mix:

      (source, n_docs, n_tokens, token_share, weight)

    token_share = group tokens / corpus tokens; weight = the multiplier
    that equalizes token mass across groups (target uniform:
    (total/n_groups) / group_tokens) — >1 means upsample, <1 downsample.
    Doubles are 1e-6-floor-rounded on both engines. Token count is the
    '\\s+' whitespace count (consistent with doc_lines token blocks).
    One groupBy over metadata-width rows; the totals come from a window
    over the GROUPED frame (|groups| rows), not a second corpus scan."""
    ntok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    ngroups = F.count(F.lit(1)).over(w)
    return per.select(
        group_col,
        "n_docs",
        "n_tokens",
        _frac6(F.col("n_tokens"), total).alias("token_share"),
        _frac6(total, ngroups * F.col("n_tokens")).alias("weight"),
    )


# Knuth multiplicative-hash constant (2^32 / golden ratio, Knuth TAOCP
# vol 3 §6.4) — public-domain mixing constant, same family as the
# splitmix64 constants in functions/hashing.py.
_KNUTH32 = 2654435761


def sample_u(doc_id: Column) -> Column:
    """Deterministic per-doc uniform u in [0, 1) — exact across engines.

    u = ((doc_id mod 2^31) * 2654435761 mod 2^32) / 2^32. The first mod
    keeps the product under 2^63, i.e. it fits signed int64: max is
    (2^31-1)*2654435761 ≈ 5.7e18 < 2^63 ≈ 9.2e18 (no int64 overflow —
    DuckDB raises on
    bigint overflow while Java wraps, so overflow-free arithmetic is the
    only cross-engine-safe kind), and the numerator is < 2^32, so the
    division is EXACT in a double: no rounding convention is needed for
    the u < frac(w) comparison to agree bit-for-bit."""
    a = F.pmod(doc_id.cast("long"), F.lit(2**31))
    h = F.pmod(a * F.lit(_KNUTH32), F.lit(2**32))
    return h.cast("double") / F.lit(float(2**32))


def mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The APPLY side of mix_weights: per-doc copy count realizing the
    per-group resampling weight.

      (doc_id, source, weight, n_copies)

    n_copies = floor(w) + 1{u < frac(w)} with u = sample_u(doc_id) — the
    standard stochastic-rounding realization whose expectation per doc is
    exactly w, so group token mass converges to the uniform target mix.
    Deterministic (same corpus -> same copies), engine-exact (u and w are
    both bit-reproducible doubles), and scale-flat: the weight table is
    |groups| rows broadcast back onto the corpus; everything per-row is
    codegen column math — no second corpus shuffle, no Python."""
    weights = mix_weights(docs, group_col, text_col).select(
        group_col, "weight"
    )
    u = sample_u(F.col("doc_id"))
    base = F.floor(F.col("weight")).cast("long")
    frac = F.col("weight") - F.floor(F.col("weight"))
    return (
        docs.select("doc_id", group_col)
        .join(F.broadcast(weights), group_col)
        .select(
            "doc_id",
            group_col,
            "weight",
            (base + F.when(u < frac, 1).otherwise(0)).cast("int").alias(
                "n_copies"
            ),
        )
    )


def cluster_rep_policy(
    docs: DataFrame,
    labels: DataFrame,
    policy: str = "longest",
) -> DataFrame:
    """Representative selection per near-dup cluster, by policy:

      (doc_id, cluster_id, rep_id)

    policy:
      "earliest" — min doc_id (the reference's backward-ref rule and the
                   pipeline default);
      "longest"  — max length(text), ties to min doc_id (keep the most
                   complete capture of a re-crawled page);
      "quality"  — max whitespace-token count, ties to min doc_id (a
                   stand-in for any scalar quality score).

    Implemented as one row_number window per cluster on BOTH engines so
    tie semantics are definitionally identical. The window partitions by
    cluster_id — cluster sizes are bounded by real duplication (and by
    the pipeline's degree caps), so no cluster floods a partition."""
    metric: Column
    if policy == "earliest":
        metric = F.lit(0)
    elif policy == "longest":
        metric = F.length("text")
    elif policy == "quality":
        metric = F.when(
            F.length(F.trim(F.col("text"))) == 0, F.lit(0)
        ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    else:
        raise ValueError(f"cluster_rep_policy: unknown policy {policy!r}")
    j = labels.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "cluster_id", metric.alias("_m")
    )
    rn = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.col("_m").desc(), F.col("doc_id").asc()
        )
    )
    reps = (
        j.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("rep_id"))
    )
    return j.select("doc_id", "cluster_id").join(reps, "cluster_id").select(
        "doc_id", "cluster_id", "rep_id"
    )
