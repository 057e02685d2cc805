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
                  as-of that doc's batch
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

    def _append_keys(self, reps: DataFrame) -> None:
        (
            fused.fused_keyed_rows(reps, self.cfg)
            .withColumn("shard", F.pmod(F.col("key"), F.lit(N_SHARDS)).cast("int"))
            .write.mode("append")
            .partitionBy("shard")
            .parquet(self._p("keys"))
        )

    # ---------------------------------------------------------- bootstrap
    def bootstrap(self, pages: DataFrame) -> DataFrame:
        """Initial full pipeline run; persists sigs/keys/assignments."""
        from pcompress_spark.pipeline import DedupPipeline

        pipe = DedupPipeline(
            self.spark,
            self.cfg,
            checkpoint_dir=self._p("_bootstrap_ckpt"),
            resume=False,
        )
        assignments = pipe.run(pages)
        assignments.select("doc_id", "cluster_id").write.mode(
            "overwrite"
        ).parquet(self._p("assignments"))
        # run() just materialized the sigs stage — read it back rather
        # than recomputing the signature UDF pass
        sigs = pipe.ckpt.load("sigs")
        reps = exact.representatives(sigs, exact.text_groups(sigs))
        reps.write.mode("overwrite").parquet(self._p("sigs"))
        self._append_keys(reps)
        return self.assignments()

    # -------------------------------------------------------- assignments
    def assignments(self) -> DataFrame:
        """(doc_id, cluster_id) for every ingested doc, merge closure
        applied — equal to what a full run over everything would label."""
        a = self._read("assignments")
        if a is None:
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        m = self._read("merges")
        if m is None:
            return a
        # merges are metadata-scale (bounded by clusters bridged per
        # batch, not by rows): close the chains driver-side and apply as
        # one broadcast map — an iterative join loop would run a Spark
        # job per chain hop for a table of a few hundred rows.
        chain = {r["old_cluster"]: r["new_cluster"] for r in m.collect()}
        if not chain:
            return a

        def final(c: int) -> int:
            seen = set()
            while c in chain and c not in seen:
                seen.add(c)
                c = chain[c]
            return c

        closed = [(k, final(k)) for k in chain]
        mm = F.broadcast(self.spark.createDataFrame(closed, _MERGE_SCHEMA))
        return (
            a.join(mm, a["cluster_id"] == mm["old_cluster"], "left")
            .withColumn("cluster_id", F.coalesce("new_cluster", "cluster_id"))
            .select("doc_id", "cluster_id")
        )

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
        cfg, spark = self.cfg, self.spark
        with CacheScope():
            # PLAN BARRIERS (localCheckpoint, not just persist): in the
            # full pipeline every fan-out frame sits on a parquet-scan
            # checkpoint, so its many downstream plan references are
            # leaves. Here the whole batch is one lazy tree, and frames
            # like `active` are referenced 5+ times by the fused/verify
            # machinery — each reference duplicates the entire upstream
            # subtree in the logical plan and Catalyst analysis goes
            # exponential (measured: a 2-doc batch spent 10+ min inside
            # AttributeSet/missingInput before any task ran). An eager
            # localCheckpoint truncates the plan at executor storage —
            # the in-memory analog of the pipeline's durable barriers.
            old_sigs = self._read("sigs")
            old_keys = self._read("keys")
            resolved = tracked_persist(self.assignments())

            sigs = (
                exact.build_sigs(pages, cfg)
                .join(resolved.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if sigs.isEmpty():  # fully re-delivered batch: nothing to do
                return sigs.select("doc_id", F.lit(0).cast("long").alias("cluster_id"))
            groups = exact.text_groups(sigs)
            breps = tracked_persist(exact.representatives(sigs, groups))

            # ---- tier 1: identity vs corpus (sha join against delegates)
            if old_sigs is not None:
                old_ident = old_sigs.select(
                    "text_sha", F.col("doc_id").alias("old_id")
                )
                ident = tracked_persist(
                    breps.select("doc_id", "text_sha")
                    .join(old_ident, "text_sha")
                    .join(
                        resolved.withColumnRenamed("doc_id", "old_id"),
                        "old_id",
                    )
                    .select(
                        "doc_id", F.col("cluster_id").alias("old_cluster")
                    )
                )
                fresh = breps.join(ident, "doc_id", "left_anti")
            else:
                ident = spark.createDataFrame(
                    [], "doc_id long, old_cluster long"
                )
                fresh = breps
            fresh = fresh.localCheckpoint(eager=True)

            # ---- tier 2: probe the key index for the touched slice
            if old_keys is not None and old_sigs is not None:
                bkeys = fused.fused_keyed_rows(fresh, cfg).withColumn(
                    "shard", F.pmod(F.col("key"), F.lit(N_SHARDS)).cast("int")
                )
                touched = (
                    old_keys.join(
                        bkeys.select("shard", "ch", "key").distinct(),
                        ["shard", "ch", "key"],
                    )
                    .select("doc_id")
                    .distinct()
                )
                active = fresh.unionByName(
                    old_sigs.join(touched, "doc_id", "left_semi")
                )
            else:
                active = fresh
            active = active.localCheckpoint(eager=True)

            # ---- tier 3: UNCHANGED candidate/verify machinery on the
            # fresh ∪ touched slice; old-old pairs are already clustered
            fresh_ids = fresh.select("doc_id")
            cands, _hot = fused.fused_candidates(active, cfg)
            fa = fresh_ids.withColumnRenamed("doc_id", "id_a")
            fb = fresh_ids.withColumnRenamed("doc_id", "id_b")
            cands = cands.join(fa, "id_a", "left_semi").unionByName(
                cands.join(fb, "id_b", "left_semi")
            ).distinct()
            filtered, _pre = verify.prefilter_candidates(
                cands, active, overlap_from_bands=(cfg.lsh_rows == 1)
            )
            capped, _cap = verify.cap_candidate_degree(
                filtered, cfg.verify_degree_cap
            )
            # PLAN BARRIER: the batch runs sigs→fused→prefilter→cap→verify
            # →CC as ONE lazy tree (the full pipeline truncates lineage at
            # its durable checkpoints; there are none here). Without a cut
            # the CC rounds re-plan the whole tree and AQE's per-update
            # plan stringification alone goes super-linear (measured: a
            # 2-doc batch hung for 10+ minutes in explainString).
            capped = capped.localCheckpoint(eager=True)
            fuzzy = verify.verify_edges(capped, active, cfg).select(
                "src", "dst"
            )

            # ---- component labels over the batch-touched subgraph, old
            # endpoints relabeled to their resolved cluster ids
            old_map = resolved.withColumnRenamed("doc_id", "_oid")

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

            # merges: an old-cluster node whose component min undercuts it
            old_clusters = resolved.select(
                F.col("cluster_id").alias("doc_id")
            ).distinct()
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

            # ---- append index state (fresh delegates only) + assignments
            batch_assign.write.mode("append").parquet(self._p("assignments"))
            if not merges.isEmpty():
                merges.write.mode("append").parquet(self._p("merges"))
            fresh.write.mode("append").parquet(self._p("sigs"))
            self._append_keys(fresh)
            return batch_assign
