"""End-to-end near-duplicate detection + clustering pipeline.

Stage graph (4 durable checkpoints, resumable; everything between them is
lazy or session-cached — round 1's per-substage parquet barriers were the
scaling bottleneck):

    pages ──► [sigs]  (url, doc_id, text_sha, lang, text, minhash, simhash)
                │
                ├── text_groups / exact_edges / reps      (lazy, cheap)
                │
                ▼      ONE fused bucket shuffle carries all three channels
            [candidates]  (minhash bands + simhash blocks + winnow anchors
                │          → fused keyed frame → salted self-join → per-pair
                │          agg → signature prefilter → degree cap);
                │          cfg.fused_channels=False runs the legacy
                │          per-channel jobs (optionally concurrent)
                ▼
             [edges]   exact ∪ verified fuzzy (jaccard / substring confirm)
                │
                ▼
          [assignments]  connected components → cluster labels

This is the Spark rewrite of `pcompress -G -D` (SURVEY §3.1): the one thing
the reference serializes (the semaphore-guarded global index,
pcompress.c:2617-2624) is exactly what the shuffle parallelizes.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from pcompress_spark.cache import CacheScope, tracked_persist
from pcompress_spark.config import DEFAULT_CONFIG, PipelineConfig
from pcompress_spark.checkpoint import CheckpointManager
from pcompress_spark.operators import exact, fused, lsh, simhash, substring, verify
from pcompress_spark.operators.components import cluster_labels


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

    # ------------------------------------------------------- shuffle sizing
    def _set_shuffle_partitions(self, n: int) -> int:
        """Size `spark.sql.shuffle.partitions` to the DATA, not the cores.

        With a purely cores-derived partition count a 4x corpus means 4x
        bytes per task and the JVM eventually tips into GC stall (measured
        in the round-1 array-join design: verify 42s at 150k pairs/32
        partitions, 350s at 405k/32 — 2.6x rows, 8x wall). Partition
        count therefore grows with row volume; AQE coalesces small stages
        back down (it can merge partitions but can never split one).
        The divisors are sized to the CURRENT narrow-row design (fused
        17-byte keyed rows, text-shipped verify rows ~6 KB/pair): callers
        target roughly 10-30 MB serialized per task, because oversizing
        the count is not free — a 100k-doc run at 100 partitions spends
        ~35 ms/task of pure scheduler latency across dozens of small
        stages, measured as the main 2->8-core efficiency sink (stages at
        12-20%% utilization in the event log). Returns the previous
        setting."""
        spark = self.spark
        prev = int(spark.conf.get("spark.sql.shuffle.partitions"))
        base = int(spark.conf.get("spark.pcompress.baseShufflePartitions", str(prev)))
        spark.conf.set("spark.pcompress.baseShufflePartitions", str(base))
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(base, min(n, 4096)))
        )
        return prev

    # ------------------------------------------------------------------ run
    def run(self, pages: DataFrame) -> DataFrame:
        cfg, ckpt = self.cfg, self.ckpt

        with CacheScope():
            if cfg.curation_gate:
                from pcompress_spark.analysis.webtext import curation_gate_pages

                t0 = time.time()
                pages, drop_log = curation_gate_pages(pages)
                pages = tracked_persist(pages)
                n_kept = pages.count()
                drop_log.coalesce(1).write.mode("overwrite").parquet(
                    ckpt.path("_curation_drops")
                )
                ckpt.note(
                    "curation_gate", int((time.time() - t0) * 1000), n_kept
                )
            sigs = ckpt.materialize(
                "sigs",
                lambda: exact.build_sigs(pages, cfg),
                distinct_col="text_sha",   # lineage dup_ratio: exact dups
            )

            groups = exact.text_groups(sigs)
            # delegates (one per distinct text, text included) feed all three
            # channels plus verification — persist once, in-session.
            # Materialized lazily and exactly ONCE (first builder that needs
            # it): concurrent channel jobs racing to populate a cold cache
            # each recompute the upstream join, tripling the work.
            reps = tracked_persist(exact.representatives(sigs, groups))
            reps_ready = False

            def need_reps() -> DataFrame:
                nonlocal reps_ready
                if not reps_ready:
                    reps.count()
                    reps_ready = True
                return reps

            # channel bucket/candidate caches live only as long as the
            # candidates stage: scope them so verify gets the memory back
            with CacheScope():
                # band explode / bucket joins move ~n_docs * bands narrow
                # rows (~20 B each): ~70 B x bands per doc -> ~1.4 KB/doc,
                # so ~20k docs/partition ~= 30 MB serialized per task
                prev = self._set_shuffle_partitions(sigs.count() // 20_000)
                try:
                    cands = ckpt.materialize(
                        "candidates", lambda: self._candidates(need_reps())
                    )
                finally:
                    self.spark.conf.set(
                        "spark.sql.shuffle.partitions", str(prev)
                    )

            with CacheScope():
                # the verify join carries the two utf-8 texts per candidate
                # pair (~6 KB); ~4k pairs/partition ~= 25 MB serialized
                prev = self._set_shuffle_partitions(cands.count() // 4000)
                try:
                    edges = ckpt.materialize(
                        "edges",
                        lambda: exact.exact_edges(sigs, groups).unionByName(
                            self._fuzzy_edges(cands, need_reps())
                        ),
                    )
                finally:
                    # CC rounds run many small jobs — restore the compact
                    # cores-derived count before the assignments stage
                    self.spark.conf.set(
                        "spark.sql.shuffle.partitions", str(prev)
                    )

            assignments = ckpt.materialize(
                "assignments",
                lambda: self._assignments(sigs, edges),
                distinct_col="cluster_id",  # lineage dup_ratio: all channels
            )
        return assignments

    # --------------------------------------------------------- fuzzy edges
    def _fuzzy_edges(self, cands: DataFrame, reps: DataFrame) -> DataFrame:
        """verify_edges with its shared Jaccard frame pre-materialized.

        The near/substring branches of the edges union both read the
        persisted pair-Jaccard frame; forcing it here means the union
        action hits a warm cache instead of concurrently (re)computing the
        verify join once per branch."""
        t0 = time.time()
        edges_fuzzy = verify.verify_edges(
            cands, reps, self.cfg, eager_jaccard=True
        )
        self.ckpt.note("verify_jaccard", int((time.time() - t0) * 1000))
        return edges_fuzzy.select("src", "dst", "jaccard", "kind")

    # ---------------------------------------------------------- candidates
    def _candidates(self, reps: DataFrame) -> DataFrame:
        """Candidate generation + merge + prefilter + degree cap.

        Default (cfg.fused_channels): ONE fused bucket shuffle carries all
        three channels (operators/fused.py) — one persist, one stats
        groupBy, one salted self-join, one per-pair aggregation. The
        legacy path (fused_channels=False) runs the three channels as
        separate Spark jobs, optionally concurrent."""
        cfg = self.cfg
        t0 = time.time()
        hot = None
        if cfg.fused_channels and cfg.lsh_rows == 1:
            # one fused explode -> bucket_pairs pass for all three
            # channels WITH the signature prefilter folded in: band-noise
            # junk (the ~99% majority) is dropped off the narrow persisted
            # count frame before the hot-key/simhash/prefilter joins ever
            # shuffle it, and the single junk-stream persist lives inside
            # fused (persisting it twice — merge + prefilter — was a
            # measured ~20% of the candidates barrier at 100k docs).
            filtered, hot, pre_dropped = fused.fused_prefiltered(reps, cfg)
        elif cfg.fused_channels:
            # r > 1: the banding ITSELF is the precision screen — a junk
            # pair (background J≈0.02) collides in a band w.p. ~J^r, so
            # at r=2 the candidate stream is ~99.6% real vs ~67% junk at
            # r=1. The signature prefilter was built for r=1's junk rate;
            # at r>1 its exact array-intersect costs more than the junk
            # it removes (measured r5: the r2 leg's candidates stage
            # carried the intersect for a sub-1% junk fraction), and any
            # pair it would drop fails the exact-Jaccard τ gate in
            # verify anyway — skipping it is recall-safe (golden b=10/
            # r=2 gate pins 1.00). cfg.r_gt1_band_screen remains the
            # library-level lever for prefilter_candidates callers.
            # Reference analog: the -EE regime trusts verification at a
            # looser sketch threshold (rabin_dedup.h:153-159).
            merged, hot = fused.fused_candidates(reps, cfg)
            if "band_hits" in merged.columns:
                merged = merged.drop("band_hits")
            filtered = merged
            pre_dropped = self.spark.createDataFrame(
                [], "doc_id long, n_dropped bigint"
            )
        else:
            merged = self._candidates_legacy(reps)
            filtered, pre_dropped = verify.prefilter_candidates(
                merged, reps, overlap_from_bands=(cfg.lsh_rows == 1)
            )
        capped, cap_dropped = verify.cap_candidate_degree(
            filtered, cfg.verify_degree_cap
        )
        # one sequential pass materializes the capped set AND the persisted
        # scored/ranked frames it reads through; the drop logs, hot-bucket
        # logs (and the checkpoint write that follows) then scan warm
        # caches instead of re-running the merge/prefilter joins once per
        # consumer
        capped = tracked_persist(capped)
        n = capped.count()
        self.ckpt.note("candidates_gen", int((time.time() - t0) * 1000), n)
        logs = []
        if hot is not None:
            hot = tracked_persist(hot)
            hot.count()  # materialize once before concurrent readers
            logs += [
                (name, hot.filter(F.col("ch") == ch_val).drop("ch"))
                for ch_val, name in fused.CHANNEL_NAMES.items()
            ]
        logs += [("prefilter", pre_dropped), ("degree_cap", cap_dropped)]
        # each log is a tiny independent job reading warm caches; run them
        # concurrently (FAIR scheduler) — sequential submission was ~15s of
        # near-idle wall per run, a flat cost that sinks scaling efficiency
        with ThreadPoolExecutor(max_workers=len(logs)) as ex:
            list(ex.map(lambda nf: self._log_hot(*nf), logs))
        return capped

    def _candidates_legacy(self, reps: DataFrame) -> DataFrame:
        """Three per-channel Spark jobs, optionally concurrent (threads
        share the SparkContext; with the FAIR scheduler their stages
        interleave, so the cluster is busy even while any one channel sits
        in a narrow phase)."""
        cfg = self.cfg

        def _run(name: str, fn):
            t0 = time.time()
            c, hot = fn()
            c = tracked_persist(c)
            n = c.count()  # materialize this channel's candidates in-thread
            self._log_hot(name, hot)
            self.ckpt.note(
                f"channel_{name}", int((time.time() - t0) * 1000), n
            )
            return c

        channels = [
            ("lsh", lambda: lsh.lsh_candidates(reps, cfg)),
            ("simhash", lambda: simhash.simhash_candidates(reps, cfg)),
            ("winnow", lambda: substring.substring_candidates(reps, cfg)),
        ]
        # cfg.concurrent_channels: True on multi-node clusters (each
        # executor brings its own memory bus); "auto" applies the
        # single-box heuristic — three concurrent pandas-UDF jobs at >= 16
        # local slots oversubscribe one socket's memory bus (measured
        # 2-3x per-channel slowdown at local[32], 16 phys cores + SMT).
        if cfg.concurrent_channels == "auto":
            concurrent = self.spark.sparkContext.defaultParallelism < 16
        else:
            concurrent = bool(cfg.concurrent_channels)
        workers = len(channels) if concurrent else 1
        with ThreadPoolExecutor(max_workers=workers) as ex:
            frames = list(
                ex.map(lambda nf: _run(nf[0], nf[1]), channels)
            )
        return verify.merge_candidates(*frames)

    # ---------------------------------------------------------- assignments
    def _assignments(self, sigs: DataFrame, edges: DataFrame) -> DataFrame:
        labels = cluster_labels(edges.select("src", "dst"))
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
        """Persist the hot-bucket/drop log — drops are never silent.
        Logs are tiny (bucket keys / per-doc counts): coalesce the write
        so it is a handful of tasks, not one per shuffle partition.

        Schema note: for the fused channel under `packed_bucket_keys`
        the `key` column is an OPAQUE low-62-bit bucket id (see
        operators/fused.py packed-path comment), not the channel's
        actual band/block key — do not join it against index or
        per-channel bucket keys."""
        hot.coalesce(8).write.mode("overwrite").parquet(
            self.ckpt.path(f"_hot_buckets_{channel}")
        )
