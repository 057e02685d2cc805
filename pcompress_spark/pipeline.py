"""End-to-end near-duplicate detection + clustering pipeline.

Stage graph (each stage checkpointed + lineage-logged, resumable):

    pages ──► sigs ──► text_groups ──► exact_edges
                │            │
                │            └──► reps (delegates, one per distinct text)
                │                    ├──► lsh candidates      (minhash bands)
                │                    ├──► simhash candidates  (16-bit blocks)
                │                    └──► winnow candidates   (anchors)
                │                             │ union+distinct
                │                             ▼
                │                     verified edges (exact jaccard / lcs)
                │                             │ ∪ exact_edges
                │                             ▼
                └────────────────► connected components ──► assignments

This is the Spark rewrite of `pcompress -G -D` (SURVEY §3.1): the one thing
the reference serializes (the semaphore-guarded global index,
pcompress.c:2617-2624) is exactly what the shuffle parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pcompress_spark.cache import release_all, tracked_persist
from pcompress_spark.config import DEFAULT_CONFIG, PipelineConfig
from pcompress_spark.checkpoint import CheckpointManager
from pcompress_spark.operators import exact, lsh, simhash, substring, verify
from pcompress_spark.operators.components import connected_components


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        checkpoint_dir: str | None = None,
        resume: bool = True,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(
            spark, checkpoint_dir or cfg.checkpoint_dir, resume=resume
        )

    # ------------------------------------------------------------------ run
    def run(self, pages: DataFrame) -> DataFrame:
        cfg, ckpt = self.cfg, self.ckpt

        sigs = ckpt.materialize("sigs", lambda: exact.build_sigs(pages, cfg))

        groups = ckpt.materialize("text_groups", lambda: exact.text_groups(sigs))

        exact_e = ckpt.materialize(
            "edges_exact", lambda: exact.exact_edges(sigs, groups)
        )

        reps = ckpt.materialize(
            "reps", lambda: exact.representatives(sigs, groups)
        )
        # delegates + their text for verification / winnowing
        reps_text = ckpt.materialize(
            "reps_text",
            lambda: reps.select("doc_id").join(
                pages.select(F.xxhash64("url").alias("doc_id"), "text"), "doc_id"
            ),
        )

        def _candidates() -> DataFrame:
            # each channel frame feeds the merged union exactly once, but
            # without persist the bucket self-joins would re-run inside the
            # merge job after the hot-log writes already ran them
            lsh_c, lsh_hot = lsh.lsh_candidates(reps, cfg)
            sim_c, sim_hot = simhash.simhash_candidates(reps, cfg)
            win_c, win_hot = substring.substring_candidates(reps_text, cfg)
            lsh_c, sim_c, win_c = (
                tracked_persist(lsh_c),
                tracked_persist(sim_c),
                tracked_persist(win_c),
            )
            self._log_hot("lsh", lsh_hot)
            self._log_hot("simhash", sim_hot)
            self._log_hot("winnow", win_hot)
            merged = verify.merge_candidates(lsh_c, sim_c, win_c)
            filtered = verify.prefilter_candidates(merged, reps)
            capped, dropped = verify.cap_candidate_degree(
                filtered, cfg.verify_degree_cap
            )
            self._log_hot("degree_cap", dropped)
            return capped

        try:
            cands = ckpt.materialize("candidates", _candidates)
            # channel/bucket caches are dead once candidates hit storage;
            # free them before the array-heavy verify stage needs the memory
            release_all()

            edges_fuzzy = ckpt.materialize(
                "edges_fuzzy",
                lambda: verify.verify_edges(cands, reps_text, cfg),
            )
            release_all()

            edges = ckpt.materialize(
                "edges",
                lambda: exact_e.unionByName(
                    edges_fuzzy.select("src", "dst", "jaccard", "kind")
                ),
            )

            assignments = ckpt.materialize(
                "assignments", lambda: self._assignments(sigs, edges)
            )
        finally:
            # every stage re-reads from its checkpoint, so intermediate
            # caches are dead weight once materialized — release them or
            # back-to-back runs in one session degrade (cache thrash)
            release_all()
        return assignments

    # ---------------------------------------------------------- assignments
    def _assignments(self, sigs: DataFrame, edges: DataFrame) -> DataFrame:
        labels = connected_components(edges.select("src", "dst"))
        docs = sigs.select("url", "doc_id")
        assigned = docs.join(labels, "doc_id", "left").withColumn(
            "cluster_id", F.coalesce("cluster_id", "doc_id")
        )
        rep_urls = docs.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("url").alias("representative_url"),
        )
        return assigned.join(rep_urls, "cluster_id", "left").select(
            "url",
            "doc_id",
            "cluster_id",
            "representative_url",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
        )

    # -------------------------------------------------------------- helpers
    def _log_hot(self, channel: str, hot: DataFrame) -> None:
        """Persist the hot-bucket downgrade log — drops are never silent."""
        hot.write.mode("overwrite").parquet(
            self.ckpt.path(f"_hot_buckets_{channel}")
        )
