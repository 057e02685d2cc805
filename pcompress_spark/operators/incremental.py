"""Incremental dedup: assign NEW batches against a persisted corpus index.

The 100-TB deployment ingests a daily crawl increment; re-running the full
pipeline over corpus+batch would re-shuffle the world to classify 0.1% new
rows. This module persists the pipeline's state as a probe-able index and
classifies a batch touching only the slice of the corpus the batch's keys
actually collide with — the Spark-batch analog of the reference's
persistent global index across pipe chunks (`db_lookup_insert_s`,
rabin/global/index.c:485-558: every new block probes the accumulated
index, matches become backrefs, misses are inserted).

Index layout under `index_dir` (parquet here; the production deployment
writes the same tables as Iceberg, giving atomic batch commits):

    sigs/         delegate rows (one per distinct corpus text) — the
                  representatives() schema incl. text (needed to verify
                  probe hits exactly)
    keys/         fused (doc_id, ch, key) bucket keys of every delegate,
                  partitioned by shard = pmod(key, N_SHARDS) so a probe
                  join co-partitions and small batches prune shards
    assignments/  (doc_id, cluster_id) for every doc ever ingested, labels
                  as-of that doc's batch; shard-partitioned by
                  pmod(xxhash64(doc_id), N_SHARDS) so redelivery checks
                  and point lookups prune
    merges/       (old_cluster, new_cluster) — appended when a batch doc
                  bridges existing clusters; resolved at read time

Batch algorithm (`add_batch`):
 1. identity tier — batch texts whose sha already exists in `sigs` join
    their delegate's cluster (no fuzzy work, no index growth);
 2. probe — fresh delegates' fused keys join `keys` on (ch, key); the
    distinct old doc_ids hit are the "touched slice";
 3. re-run the UNCHANGED candidate/verify machinery
    (fused_candidates -> prefilter -> degree cap -> verify_edges) over
    fresh ∪ touched delegates only, then drop old-old pairs (already
    clustered) — cost scales with the slice, semantics identical to the
    full pipeline by construction;
 4. connected components over (batch exact edges) ∪ (identity edges) ∪
    (verified fuzzy edges with old endpoints relabeled to their RESOLVED
    cluster ids): component min is then exactly the full-run min-doc_id
    label. An old cluster whose node gets a smaller label emits a merge
    row instead of rewriting history — `assignments()` applies the
    merge closure at read (union-find deltas, the only mutation an
    append-only table store allows).

Determinism: doc_id = xxhash64(url) and all sketch hashes are seeded
constants, so a batch classifies identically regardless of when or in how
many pieces it arrives (tests/test_incremental.py pins full-run parity).

Parity caveat (shared with any incremental design): the bucket cap and
per-doc degree cap are evaluated against the state VISIBLE at each
batch, while a monolithic run evaluates them against the whole corpus at
once. When a cap binds differently across those two views (a bucket that
crossed max_bucket_docs only after later batches, an old doc whose
candidate degree exceeds the cap only in the monolithic pair set), the
kept-pair sets — and, if the dropped pair was cluster-bridging, the
labels — can diverge. Exact-Jaccard verification bounds the effect to
genuinely-similar pairs in cap-saturated (boilerplate-dense)
neighborhoods; the golden-corpus and 10-batch long-run parity checks
measure zero divergence at default caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from pcompress_spark.cache import CacheScope, tracked_persist
from pcompress_spark.config import DEFAULT_CONFIG, PipelineConfig
from pcompress_spark.operators import exact, fused, verify
from pcompress_spark.operators.components import connected_components

N_SHARDS = 64

_ASSIGN_SCHEMA = "doc_id long, cluster_id long"
_MERGE_SCHEMA = "old_cluster long, new_cluster long"


class IncrementalDedupIndex:
    """Persisted dedup state + batch classification against it.

    The cfg MUST be the one the index was bootstrapped with: signature
    config is part of the index's identity (the reference refuses
    mismatched-property archives for the same reason, pcompress.c
    metadata checks)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        index_dir: str = "/tmp/pcompress_spark_index",
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.index_dir = index_dir.rstrip("/")

    # ------------------------------------------------------------ storage
    def _p(self, name: str) -> str:
        return f"{self.index_dir}/{name}"

    def _read(self, name: str) -> DataFrame | None:
        """Spark-side probe (works on s3a://hdfs://file:// alike — same
        rationale as streaming.ingest._try_read_seen)."""
        try:
            return self.spark.read.parquet(self._p(name))
        except AnalysisException:
            return None

    def _fs(self):
        from pcompress_spark.checkpoint import _HadoopFs

        return _HadoopFs(self.spark, self.index_dir)

    def _append_keys(self, keyed_rows: DataFrame) -> None:
        """Append (doc_id, ch, key) rows shard-partitioned. Callers pass
        an ALREADY-COMPUTED keyed frame (the probe builds one anyway) —
        recomputing here would run the winnow-anchor UDF a second time
        over every batch text."""
        (
            keyed_rows.select("doc_id", "ch", "key")
            .withColumn("shard", F.pmod(F.col("key"), F.lit(N_SHARDS)).cast("int"))
            .write.mode("append")
            .partitionBy("shard")
            .parquet(self._p("keys"))
        )

    # ---------------------------------------------------------- bootstrap
    def bootstrap(self, pages: DataFrame) -> DataFrame:
        """Initial full pipeline run; persists sigs/keys/assignments.

        Any pre-existing index state under index_dir is CLEARED first:
        keys/ appends and a surviving merges/ from an earlier life of the
        directory would otherwise double every bucket count and replay
        stale merges onto the fresh labels (cluster ids are deterministic
        hashes, so a stale map still matches)."""
        from pcompress_spark.pipeline import DedupPipeline

        fs = self._fs()
        for name in ("sigs", "keys", "assignments", "merges"):
            fs.delete(self._p(name))
        pipe = DedupPipeline(
            self.spark,
            self.cfg,
            checkpoint_dir=self._p("_bootstrap_ckpt"),
            resume=False,
        )
        assignments = pipe.run(pages)
        # run() just materialized the sigs stage — read it back rather
        # than recomputing the signature UDF pass
        sigs = pipe.ckpt.load("sigs")
        reps = exact.representatives(sigs, exact.text_groups(sigs))
        reps.write.mode("overwrite").parquet(self._p("sigs"))
        self._append_keys(fused.fused_keyed_rows(reps, self.cfg))
        # assignments commit LAST (same rationale as add_batch)
        self._write_assignments(assignments, mode="overwrite")
        return self.assignments()

    def _write_assignments(self, df: DataFrame, mode: str) -> None:
        """Assignments land shard-partitioned (pmod(xxhash64(doc_id), N))
        like the streaming `seen` index: point lookups and the
        redelivery anti-join then read only the shard partitions a batch
        hashes into, not the whole ingest history."""
        (
            df.select("doc_id", "cluster_id")
            .withColumn(
                "shard", F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS)).cast("int")
            )
            .write.mode(mode)
            .partitionBy("shard")
            .parquet(self._p("assignments"))
        )

    # -------------------------------------------------------- assignments
    def _merge_closure(self) -> DataFrame | None:
        """Path-compressed merge map as a broadcastable (old_cluster,
        new_cluster) frame, or None when there are no merges.

        Merges are metadata-scale (bounded by clusters bridged per batch,
        not by rows): close the chains driver-side and apply as one
        broadcast map — an iterative join loop would run a Spark job per
        chain hop for a table of a few hundred rows."""
        m = self._read("merges")
        if m is None:
            return None
        chain = {r["old_cluster"]: r["new_cluster"] for r in m.collect()}
        if not chain:
            return None

        def final(c: int) -> int:
            seen = set()
            while c in chain and c not in seen:
                seen.add(c)
                c = chain[c]
            return c

        closed = [(k, final(k)) for k in chain]
        return F.broadcast(self.spark.createDataFrame(closed, _MERGE_SCHEMA))

    @staticmethod
    def _apply_closure(a: DataFrame, mm: DataFrame | None) -> DataFrame:
        if mm is None:
            return a.select("doc_id", "cluster_id")
        return (
            a.join(mm, a["cluster_id"] == mm["old_cluster"], "left")
            .withColumn("cluster_id", F.coalesce("new_cluster", "cluster_id"))
            .select("doc_id", "cluster_id")
        )

    def assignments(self) -> DataFrame:
        """(doc_id, cluster_id) for every ingested doc, merge closure
        applied — equal to what a full run over everything would label."""
        a = self._read("assignments")
        if a is None:
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        return self._apply_closure(
            a.select("doc_id", "cluster_id"), self._merge_closure()
        )

    def _resolved_for(
        self, ids: DataFrame, mm: DataFrame | None
    ) -> DataFrame:
        """Merge-resolved (doc_id, cluster_id) for the given doc_ids ONLY,
        reading just the assignments shard partitions those ids hash into
        (partition filter pushed to the scan) — batch operations never
        scan the full ingest history (the merge_batch pruning pattern,
        streaming/ingest.py)."""
        a = self._read("assignments")
        if a is None:
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        shards = [
            r["s"]
            for r in ids.select(
                F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS))
                .cast("int")
                .alias("s")
            )
            .distinct()
            .collect()
        ]
        a = (
            a.filter(F.col("shard").isin(shards))
            .select("doc_id", "cluster_id")
            .join(ids.select("doc_id").distinct(), "doc_id", "left_semi")
        )
        return self._apply_closure(a, mm)

    def compact(self) -> int:
        """Fold the merge closure into the assignments table and clear
        `merges/` — the periodic maintenance op of a long-lived index
        (segcache compaction analog, rabin/global/index.c:335-453).
        Returns the number of merge rows folded. Resolution semantics are
        unchanged: before compaction readers resolve (assignments ∘
        merges), after they read assignments directly.

        The resolved frame is written to a STAGING directory first, then
        swapped in by rename, so the rewrite never reads the files it is
        replacing; on the production table format this whole op is one
        atomic snapshot commit."""
        m = self._read("merges")
        if m is None:
            return 0
        n = m.count()
        # durable staging write + rename swap: an in-place overwrite
        # deletes the old files before the new ones commit, so an
        # executor/driver loss mid-write would destroy the only copy of
        # the ingest history. The rename pair is metadata-only on
        # HDFS/local; on S3-class stores the table format's snapshot
        # commit replaces this whole dance.
        fs = self._fs()
        fs.delete(self._p("_assignments_staged"))
        (
            self.assignments()
            .withColumn(
                "shard", F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS)).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(self._p("_assignments_staged"))
        )
        fs.delete(self._p("assignments"))
        if not fs.rename(self._p("_assignments_staged"), self._p("assignments")):
            # the staged copy is the ONLY resolved one now (assignments/
            # was just deleted) — put it back in place of the deleted
            # table and KEEP merges/ so readers still resolve correctly,
            # then fail loudly rather than continuing to delete the merge
            # log (which would leave an index with no assignments at all).
            restored = fs.rename(
                self._p("_assignments_staged"), self._p("assignments")
            )
            raise IOError(
                "compact(): rename of staged assignments failed"
                + ("" if restored else " AND restore-retry failed — "
                   f"resolved table left at {self._p('_assignments_staged')}")
                + "; merges/ left intact so reads remain correct"
            )
        fs.delete(self._p("merges"))
        return n

    # ------------------------------------------------------ bipartite probe
    def _bipartite_candidates(
        self,
        bkeys: DataFrame,
        fresh: DataFrame,
        old_keys: DataFrame | None,
        cfg: PipelineConfig,
    ) -> DataFrame:
        """candidates(id_a, id_b, channels, mh_overlap, is_star) for every
        pair with >= 1 fresh endpoint — the incremental analog of
        fused_candidates with identical per-pair semantics:

        - in-cap buckets: all (fresh x member) pairs, one row per shared
          (ch, key), so the minhash groupBy count IS band co-occurrence;
        - over-cap buckets: member <-> bucket-rep star pairs only (the
          same downgrade bucket_pairs applies), restricted to pairs
          touching a fresh doc; star rows are excluded from the band
          count and compensated by the shared hot-key intersect, exactly
          as operators/fused.py does, so mh_overlap stays the EXACT
          signature overlap;
        - hamming confirmation for simhash-proposed pairs via the stored
          simhash of both endpoints.

        Cost ∝ |fresh keys| x in-cap bucket width (<= max_bucket_docs),
        independent of corpus size; the corpus contributes only its
        stored keyed rows for the probed keys. Old docs' signatures and
        winnow anchors are read from the index, never recomputed.
        """
        from pcompress_spark.operators.fused import CH_MINHASH, CH_SIMHASH, CH_WINNOW

        if old_keys is not None:
            probe = bkeys.select("ch", "key").distinct()
            matched_old = old_keys.join(probe, ["ch", "key"], "left_semi").select(
                "doc_id", "ch", "key"
            )
            # crash-recovery docs are in BOTH sides (they stay in `fresh`,
            # so bkeys recomputes their keys, AND their stored keys sit in
            # old_keys) — drop the stored copy or per-bucket _n counts
            # them twice, which can flip an in-cap bucket over
            # max_bucket_docs and alter pair generation vs a clean run
            matched_old = matched_old.join(
                bkeys.select("doc_id").distinct(), "doc_id", "left_anti"
            )
            rows = bkeys.unionByName(matched_old)
        else:
            rows = bkeys
        rows = tracked_persist(rows)
        stats = tracked_persist(
            rows.groupBy("ch", "key").agg(
                F.count(F.lit(1)).alias("_n"), F.min("doc_id").alias("_rep")
            )
        )
        joined = rows.join(stats, ["ch", "key"])
        incap = joined.filter(F.col("_n") <= cfg.max_bucket_docs).select(
            "ch", "key", "doc_id"
        )
        fr = incap.join(fresh.select("doc_id"), "doc_id", "left_semi").select(
            "ch", "key", F.col("doc_id").alias("fid")
        )
        pr = (
            fr.join(
                incap.select("ch", "key", F.col("doc_id").alias("oid")),
                ["ch", "key"],
            )
            .filter(F.col("fid") != F.col("oid"))
            .select(
                "ch",
                "key",
                F.least("fid", "oid").alias("id_a"),
                F.greatest("fid", "oid").alias("id_b"),
            )
            .distinct()  # fresh-fresh pairs arrive once from each side
            .withColumn("is_star", F.lit(False))
        )
        hotj = joined.filter(F.col("_n") > cfg.max_bucket_docs)
        star_all = hotj.filter(F.col("doc_id") != F.col("_rep")).select(
            "ch",
            "key",
            F.least("doc_id", "_rep").alias("id_a"),
            F.greatest("doc_id", "_rep").alias("id_b"),
        )
        fa = fresh.select(F.col("doc_id").alias("id_a"))
        fb = fresh.select(F.col("doc_id").alias("id_b"))
        star = (
            star_all.join(fa, "id_a", "left_semi")
            .unionByName(star_all.join(fb, "id_b", "left_semi"))
            .distinct()
            .withColumn("is_star", F.lit(True))
        )
        agg = pr.unionByName(star).groupBy("id_a", "id_b").agg(
            F.sum(
                F.when(
                    (F.col("ch") == CH_MINHASH) & ~F.col("is_star"), 1
                ).otherwise(0)
            )
            .cast("int")
            .alias("_mh_cnt"),
            F.max(F.col("ch") == CH_MINHASH).alias("_mh_any"),
            F.max(F.col("ch") == CH_SIMHASH).alias("_sh_bucket"),
            F.max(F.col("ch") == CH_WINNOW).alias("_wn"),
            F.max((F.col("ch") == CH_MINHASH) & F.col("is_star")).alias(
                "is_star"
            ),
        )
        # exact band count under the star downgrade: add the shared
        # over-cap minhash bucket keys back (operators/fused.py:86-98)
        hot_mh = stats.filter(
            (F.col("_n") > cfg.max_bucket_docs) & (F.col("ch") == CH_MINHASH)
        ).select("ch", "key")
        hot_docs = (
            rows.join(hot_mh, ["ch", "key"], "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("key").alias("_hk"))
        )
        ha = hot_docs.select(F.col("doc_id").alias("id_a"), F.col("_hk").alias("_hk_a"))
        hb = hot_docs.select(F.col("doc_id").alias("id_b"), F.col("_hk").alias("_hk_b"))
        agg = (
            agg.join(ha, "id_a", "left")
            .join(hb, "id_b", "left")
            .withColumn(
                "_mh_cnt",
                F.col("_mh_cnt")
                + F.when(
                    F.col("_hk_a").isNotNull() & F.col("_hk_b").isNotNull(),
                    F.size(F.array_intersect("_hk_a", "_hk_b")),
                ).otherwise(F.lit(0)),
            )
            .drop("_hk_a", "_hk_b")
        )
        # hamming confirm for simhash-proposed pairs (stored sketches,
        # pulled for pair endpoints only — never a full-corpus shuffle)
        agg = tracked_persist(agg)
        eids = (
            agg.select(F.col("id_a").alias("doc_id"))
            .unionByName(agg.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sims = self._sim_lookup(fresh).join(eids, "doc_id", "left_semi")
        sa = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa"))
        sb = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb"))
        scored = (
            agg.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "_sh_ok",
                F.col("_sh_bucket")
                & (
                    F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
                    <= cfg.simhash_radius
                ),
            )
        )
        channels = F.array_compact(
            F.array(
                F.when(F.col("_mh_any"), F.lit("minhash")),
                F.when(F.col("_sh_ok"), F.lit("simhash")),
                F.when(F.col("_wn"), F.lit("winnow")),
            )
        )
        mh_overlap = (
            F.when(F.col("_mh_any"), F.col("_mh_cnt"))
            if cfg.lsh_rows == 1
            else F.lit(None)
        )
        return (
            scored.withColumn("channels", channels)
            .filter(F.size("channels") > 0)
            .select(
                "id_a",
                "id_b",
                "channels",
                mh_overlap.cast("int").alias("mh_overlap"),
                "is_star",
            )
        )

    def _sim_lookup(self, fresh: DataFrame) -> DataFrame:
        """(doc_id, simhash) for fresh delegates ∪ the stored corpus."""
        sims = fresh.select("doc_id", "simhash")
        old_sigs = self._read("sigs")
        if old_sigs is not None:
            sims = sims.unionByName(old_sigs.select("doc_id", "simhash"))
        return sims

    def _endpoint_reps(
        self, pairs: DataFrame, fresh: DataFrame, old_sigs: DataFrame | None
    ) -> DataFrame:
        """Delegate rows (incl. text) for exactly the docs appearing as
        pair endpoints — the only corpus rows the verify join ships."""
        ids = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        reps = fresh
        if old_sigs is not None:
            reps = reps.unionByName(
                old_sigs.join(ids, "doc_id", "left_semi")
            )
        return reps.localCheckpoint(eager=True)

    # ---------------------------------------------------------- add_batch
    def add_batch(self, pages: DataFrame) -> DataFrame:
        """Classify a new batch against the index; append its state.
        Returns the batch's (doc_id, cluster_id) assignments (pre-closure
        labels — read `assignments()` for globally resolved ones).

        Idempotent under at-least-once redelivery (the foreachBatch
        contract, streaming/ingest.py): rows whose doc_id is already in
        `assignments` are dropped before any work, so a re-delivered
        micro-batch classifies to zero rows and appends nothing. A
        re-crawled url (same doc_id = xxhash64(url), new content) is
        likewise skipped — upsert semantics belong to the table format,
        not this operator."""
        spark = self.spark
        # size shuffles to the BATCH, not the session default: a 10k-doc
        # increment at the session's 128 partitions spends more wall in
        # task-scheduling latency than in work (measured: the candidate
        # phase alone 43.9s at 128 partitions vs 14.9s at 32 on the same
        # batch); restored on exit so co-resident jobs keep their sizing
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            return self._add_batch_inner(pages)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    def _add_batch_inner(self, pages: DataFrame) -> DataFrame:
        cfg, spark = self.cfg, self.spark
        with CacheScope():
            # PLAN BARRIERS (localCheckpoint, not just persist): in the
            # full pipeline every fan-out frame sits on a parquet-scan
            # checkpoint, so its many downstream plan references are
            # leaves. Here the whole batch is one lazy tree, and frames
            # like `fresh` are referenced 5+ times by the probe/verify
            # machinery — each reference duplicates the entire upstream
            # subtree in the logical plan and Catalyst analysis goes
            # exponential (measured: a 2-doc batch spent 10+ min inside
            # AttributeSet/missingInput before any task ran). An eager
            # localCheckpoint truncates the plan at executor storage —
            # the in-memory analog of the pipeline's durable barriers.
            old_sigs = self._read("sigs")
            old_keys = self._read("keys")
            mm = self._merge_closure()

            # in-batch url dedup (deterministic: lowest text_sha wins) —
            # a landing file can carry the same url twice and one doc_id
            # must never yield two sig rows
            from pyspark.sql import Window

            raw = exact.build_sigs(pages, cfg)
            w = Window.partitionBy("doc_id").orderBy("text_sha")
            raw = (
                raw.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .localCheckpoint(eager=True)
            )
            # redelivery guard: shard-pruned lookup of this batch's ids
            known = self._resolved_for(raw.select("doc_id"), mm)
            sigs = raw.join(
                known.select("doc_id"), "doc_id", "left_anti"
            ).localCheckpoint(eager=True)
            if sigs.isEmpty():  # fully re-delivered batch: nothing to do
                return sigs.select("doc_id", F.lit(0).cast("long").alias("cluster_id"))
            n_batch = sigs.count()
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(16, min(1024, n_batch // 400))),
            )
            groups = exact.text_groups(sigs)
            breps = tracked_persist(exact.representatives(sigs, groups))

            # ---- tier 1: identity vs corpus (sha join against delegates).
            # A SELF-match (old delegate id == this doc id) means a prior
            # delivery crashed after the sigs/keys appends but before the
            # assignments commit: the doc's index state exists but it was
            # never classified. Such docs re-enter the fresh/probe path
            # (their keys are probed from the OLD side and their sigs are
            # NOT re-appended), which makes the append sequence
            # crash-recoverable rather than merely idempotent.
            if old_sigs is not None:
                old_ident = old_sigs.select(
                    "text_sha", F.col("doc_id").alias("old_id")
                )
                matched = tracked_persist(
                    breps.select("doc_id", "text_sha").join(
                        old_ident, "text_sha"
                    )
                )
                recovery_ids = (
                    matched.filter(F.col("old_id") == F.col("doc_id"))
                    .select("doc_id")
                    .localCheckpoint(eager=True)
                )
                true_matched = matched.filter(
                    F.col("old_id") != F.col("doc_id")
                )
                old_res = self._resolved_for(
                    true_matched.select(F.col("old_id").alias("doc_id")), mm
                ).withColumnRenamed("doc_id", "old_id")
                ident = tracked_persist(
                    true_matched.join(old_res, "old_id").select(
                        "doc_id", F.col("cluster_id").alias("old_cluster")
                    )
                )
                fresh = breps.join(ident, "doc_id", "left_anti")
            else:
                ident = spark.createDataFrame(
                    [], "doc_id long, old_cluster long"
                )
                recovery_ids = spark.createDataFrame([], "doc_id long")
                fresh = breps
            fresh = fresh.localCheckpoint(eager=True)

            # ---- tier 2+3: bipartite probe of the key index. Pairs with
            # at least one fresh endpoint are built DIRECTLY from a
            # fresh-side bucket join against the STORED corpus keys — no
            # old-old pairs are ever generated and no old doc's
            # signatures/anchors are recomputed (a first version ran the
            # full fused self-join over fresh ∪ touched and measured
            # barely faster than rerunning the corpus: on a
            # boilerplate-rich 100k corpus a 10k batch touches ~everything)
            bkeys = tracked_persist(
                fused.fused_keyed_rows(fresh, cfg).select(
                    "doc_id", "ch", "key"
                )
            )
            cands = self._bipartite_candidates(bkeys, fresh, old_keys, cfg)
            # reps rows (with text) are pulled ONLY for candidate
            # endpoints — prefilter (r==1 band-count mode) and the degree
            # cap need no row data; for r>1 prefilter recomputes overlap
            # from minhash arrays, so pull before filtering then
            if cfg.lsh_rows == 1:
                filtered, _pre = verify.prefilter_candidates(
                    cands, None, overlap_from_bands=True
                )
                capped, _cap = verify.cap_candidate_degree(
                    filtered, cfg.verify_degree_cap
                )
                # PLAN BARRIER: the batch runs sigs→probe→prefilter→cap→
                # verify→CC as ONE lazy tree (the full pipeline truncates
                # lineage at its durable checkpoints; there are none
                # here). Without a cut the CC rounds re-plan the whole
                # tree and AQE's per-update plan stringification alone
                # goes super-linear (measured: a 2-doc batch hung 10+
                # minutes in explainString).
                capped = capped.localCheckpoint(eager=True)
                reps_act = self._endpoint_reps(capped, fresh, old_sigs)
            else:
                reps_act = self._endpoint_reps(cands, fresh, old_sigs)
                filtered, _pre = verify.prefilter_candidates(
                    cands, reps_act, overlap_from_bands=False
                )
                capped, _cap = verify.cap_candidate_degree(
                    filtered, cfg.verify_degree_cap
                )
                capped = capped.localCheckpoint(eager=True)
            fuzzy = verify.verify_edges(capped, reps_act, cfg).select(
                "src", "dst"
            )

            # ---- component labels over the batch-touched subgraph, old
            # endpoints relabeled to their resolved cluster ids (pruned
            # lookup: only the fuzzy endpoints' shards are read)
            fuzzy = fuzzy.localCheckpoint(eager=True)
            eids = (
                fuzzy.select(F.col("src").alias("doc_id"))
                .unionByName(fuzzy.select(F.col("dst").alias("doc_id")))
                .distinct()
            )
            old_map = tracked_persist(
                self._resolved_for(eids, mm).withColumnRenamed(
                    "doc_id", "_oid"
                )
            )

            def _to_cluster(edges: DataFrame, col: str) -> DataFrame:
                return (
                    edges.join(
                        old_map, edges[col] == old_map["_oid"], "left"
                    )
                    .withColumn(col, F.coalesce("cluster_id", col))
                    .drop("_oid", "cluster_id")
                )

            exact_e = exact.exact_edges(sigs, groups).select("src", "dst")
            ident_e = ident.select(
                F.col("doc_id").alias("src"),
                F.col("old_cluster").alias("dst"),
            )
            edges = (
                _to_cluster(_to_cluster(fuzzy, "src"), "dst")
                .unionByName(exact_e)
                .unionByName(ident_e)
            ).localCheckpoint(eager=True)  # second barrier: CC iterates
            labels = tracked_persist(connected_components(edges))

            # merges: an old-cluster node whose component min undercuts
            # it. Only clusters of TOUCHED old docs (fuzzy endpoints or
            # identity targets) can appear as CC nodes, so the candidate
            # set needs no full-history scan.
            old_clusters = (
                old_map.select(F.col("cluster_id").alias("doc_id"))
                .unionByName(ident.select(F.col("old_cluster").alias("doc_id")))
                .distinct()
            )
            merges = (
                labels.join(old_clusters, "doc_id", "left_semi")
                .filter(F.col("cluster_id") != F.col("doc_id"))
                .select(
                    F.col("doc_id").alias("old_cluster"),
                    F.col("cluster_id").alias("new_cluster"),
                )
            )

            batch_assign = (
                sigs.select("doc_id")
                .join(labels, "doc_id", "left")
                .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
                .select("doc_id", "cluster_id")
            )
            batch_assign = tracked_persist(batch_assign)
            batch_assign.count()

            # ---- append index state. ORDER IS THE CRASH CONTRACT:
            # merges/sigs/keys first, the assignments append LAST as the
            # commit record. A crash before the assignments append leaves
            # docs whose index state exists but who were never assigned —
            # exactly what the identity tier's SELF-match recovery path
            # re-classifies on redelivery without re-appending. A crash
            # after it is a completed batch (redelivery anti-joins to
            # empty). Recovery-path docs are excluded from the appends:
            # their sigs/keys are already in the index.
            if not merges.isEmpty():
                merges.write.mode("append").parquet(self._p("merges"))
            to_append = fresh.join(recovery_ids, "doc_id", "left_anti")
            to_append.write.mode("append").parquet(self._p("sigs"))
            self._append_keys(
                bkeys.join(recovery_ids, "doc_id", "left_anti")
            )
            self._write_assignments(batch_assign, mode="append")
            return batch_assign
