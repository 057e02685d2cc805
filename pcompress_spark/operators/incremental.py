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
    links/        (doc_id, parent_id) — identity membership: every
                  non-delegate doc points at the delegate whose text it
                  equals (update_batch rebuilds exact edges from these
                  when a delegate's content changes)
    tombstones/   (tbl, doc_id, ver) — per-table row versions; a row is
                  live iff its ver equals the doc's current version (see
                  the versioned-reads section below). Only created once
                  update_batch has run; plain ingest never pays for it

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
from pcompress_spark.operators.components import cluster_labels

N_SHARDS = 64

_ASSIGN_SCHEMA = "doc_id long, cluster_id long"
_MERGE_SCHEMA = "old_cluster long, new_cluster long"
_TOMB_SCHEMA = "tbl int, doc_id long, ver int"
_LINK_SCHEMA = "doc_id long, parent_id long"

# tombstone table codes (tombstones are per (table, doc): an upsert kills
# a doc's sig/key rows but not its identity children's link rows, etc.)
_TBL = {"sigs": 0, "keys": 1, "assignments": 2, "links": 3}

# update_batch broadcasts the changed-doc / affected-cluster id frames
# only below this measured-count gate (~8 MB of longs); a full re-crawl
# batch degrades to shuffle semi-joins instead of an oversized broadcast
# — same defense shape as fused.HOT_DOCS_BROADCAST_MAX.
_UPDATE_BROADCAST_MAX = 1_000_000


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
        # update_batch-window state (all None outside an update):
        # _pending_vers: broadcast (doc_id, _pv) — uncommitted next
        #   versions for the docs the update rewrites (_with_ver);
        # _sigs_overlay/_keys_overlay: the post-update pre-classification
        #   view of the corpus (changed delegates removed, promoted
        #   delegates added) that the inner classification must probe;
        # _assign_overlay: relabeled member assignments the inner
        #   classification must resolve old endpoints against;
        # _known_exclude: docs the redelivery guard must NOT skip (their
        #   content changed — they are being reclassified).
        self._pending_vers: DataFrame | None = None
        self._sigs_overlay: DataFrame | None = None
        self._keys_overlay: DataFrame | None = None
        self._assign_overlay: DataFrame | None = None
        self._known_exclude: DataFrame | None = None

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

    # ------------------------------------------------- versioned row reads
    # The index tables are append-only parquet; the only mutation an
    # append-only store allows is a NEWER record superseding an older one.
    # Re-crawl upserts (update_batch) therefore version rows: every
    # appended row carries `ver`, and `tombstones/` records (tbl, doc_id,
    # ver) with the doc's CURRENT version per table. A row is live iff
    # its ver EQUALS the doc's current version (no tombstone record means
    # version 0). The exact-match rule is what makes update_batch's
    # commit atomic: new rows are appended at version+1 first (invisible
    # — their ver exceeds the current version), then ONE tombstone append
    # flips every touched doc's version, killing the old rows and
    # activating the new ones in the same commit. Readers go through
    # _live(), which filters dead rows and hides `ver` from consumers;
    # indexes never touched by update_batch have no tombstones table and
    # pay nothing. On the production table format this mechanism is the
    # engine's row-level upsert/snapshot commit. Reference analog:
    # pcompress verifies archive-update consistency via metadata checks
    # and refuses silent mismatches (pcompress.c) — here a changed doc is
    # explicitly re-versioned, never silently dropped.

    def _kill_map(self, name: str) -> DataFrame | None:
        """Broadcastable (doc_id, _kill = current version) for table
        `name`, or None. Metadata-scale: one row per ever-updated doc."""
        t = self._read("tombstones")
        if t is None:
            return None
        km = (
            t.filter(F.col("tbl") == _TBL[name])
            .groupBy("doc_id")
            .agg(F.max("ver").alias("_kill"))
        )
        return F.broadcast(km)

    def _live(self, name: str) -> DataFrame | None:
        """Table `name` with dead/uncommitted rows filtered (ver == the
        doc's current version) and the `ver` bookkeeping column hidden —
        what every consumer should read."""
        df = self._read(name)
        if df is None:
            return None
        ver = (
            F.coalesce(F.col("ver"), F.lit(0))
            if "ver" in df.columns
            else F.lit(0)
        )
        km = self._kill_map(name)
        if km is None:
            # no tombstones table: every committed row is version 0, and
            # any ver>0 row is an uncommitted update-in-flight append
            if "ver" in df.columns:
                return df.filter(ver == 0).drop("ver")
            return df
        return (
            df.withColumn("_v", ver)
            .join(km, "doc_id", "left")
            .filter(F.col("_v") == F.coalesce(F.col("_kill"), F.lit(0)))
            .drop("_v", "_kill", "ver")
        )

    def _with_ver(self, df: DataFrame, name: str) -> DataFrame:
        """Attach the `ver` column for an append to table `name`: a doc's
        new rows are written AT its current version, so they are live
        immediately (never-updated docs write ver 0). During an
        update_batch, `_pending_vers` overrides this with the update's
        NOT-YET-COMMITTED next version, making those rows invisible until
        the closing tombstone append flips the version."""
        km = self._kill_map(name)
        cur = (
            F.lit(0)
            if km is None
            else F.coalesce(F.col("_kill"), F.lit(0))
        )
        out = df if km is None else df.join(km, "doc_id", "left")
        if self._pending_vers is not None:
            out = out.join(self._pending_vers, "doc_id", "left")
            ver = F.coalesce(F.col("_pv"), cur)
        else:
            ver = cur
        out = out.withColumn("ver", ver.cast("int"))
        for c in ("_kill", "_pv"):
            if c in out.columns:
                out = out.drop(c)
        return out

    def _cur_sigs(self) -> DataFrame | None:
        """The corpus delegate view classification must use: live sigs —
        or, inside an update window, the overlay (the COMPLETE post-update
        view: changed delegates removed, promoted delegates added)."""
        if self._sigs_overlay is not None:
            return self._sigs_overlay
        return self._live("sigs")

    def _cur_keys(self) -> DataFrame | None:
        if self._keys_overlay is not None:
            return self._keys_overlay
        return self._live("keys")

    def _append_tombstones(self, rows: DataFrame) -> None:
        rows.select("tbl", "doc_id", "ver").coalesce(1).write.mode(
            "append"
        ).parquet(self._p("tombstones"))

    def _append_links(self, links: DataFrame) -> None:
        """(doc_id, parent_id): identity membership — every non-delegate
        doc points at the delegate whose text it equals. Batch-scale
        appends; consumed by update_batch to rebuild exact edges when a
        delegate's content changes."""
        self._with_ver(
            links.select("doc_id", "parent_id"), "links"
        ).write.mode("append").parquet(self._p("links"))

    def _append_keys(self, keyed_rows: DataFrame) -> None:
        """Append (doc_id, ch, key) rows shard-partitioned. Callers pass
        an ALREADY-COMPUTED keyed frame (the probe builds one anyway) —
        recomputing here would run the winnow-anchor UDF a second time
        over every batch text.

        Rows are repartitioned BY the shard column first so each task
        writes into few shard directories: without it every one of the
        job's partitions fans out into up to N_SHARDS dirs (partitions x
        64 small files per append — measured as a material slice of the
        fixed per-batch floor). At production scale the same line becomes
        repartition(n, shard) with n > N_SHARDS."""
        (
            self._with_ver(keyed_rows.select("doc_id", "ch", "key"), "keys")
            .withColumn("shard", F.pmod(F.col("key"), F.lit(N_SHARDS)).cast("int"))
            .repartition(F.col("shard"))
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
        for name in (
            "sigs",
            "keys",
            "assignments",
            "merges",
            "links",
            "tombstones",
            "_update_inflight",
        ):
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
        groups = exact.text_groups(sigs)
        reps = exact.representatives(sigs, groups)
        self._with_ver(reps, "sigs").write.mode("overwrite").parquet(
            self._p("sigs")
        )
        self._append_keys(fused.fused_keyed_rows(reps, self.cfg))
        # identity membership of the bootstrap corpus (update_batch needs
        # it to rebuild exact edges when a delegate's content changes)
        self._append_links(
            sigs.join(groups.select("text_sha", "rep_id"), "text_sha")
            .filter(F.col("doc_id") != F.col("rep_id"))
            .select("doc_id", F.col("rep_id").alias("parent_id"))
        )
        # assignments commit LAST (same rationale as add_batch)
        self._write_assignments(assignments, mode="overwrite")
        return self.assignments()

    def _write_assignments(self, df: DataFrame, mode: str) -> None:
        """Assignments land shard-partitioned (pmod(xxhash64(doc_id), N))
        like the streaming `seen` index: point lookups and the
        redelivery anti-join then read only the shard partitions a batch
        hashes into, not the whole ingest history."""
        (
            self._with_ver(df.select("doc_id", "cluster_id"), "assignments")
            .withColumn(
                "shard", F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS)).cast("int")
            )
            .repartition(F.col("shard"))  # few files/dir (see _append_keys)
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
        applied — equal to what a full run over everything would label.

        Raises if an update_batch was interrupted mid-flight (loud, like
        the reference's refusal to read a mismatched archive): re-running
        update_batch with the same pages heals the index."""
        self._check_inflight()
        a = self._live("assignments")
        if a is None:
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        return self._apply_closure(
            a.select("doc_id", "cluster_id"), self._merge_closure()
        )

    def _check_inflight(self) -> None:
        if self._read("_update_inflight") is not None:
            raise RuntimeError(
                "index has an interrupted update_batch (marker "
                f"{self._p('_update_inflight')} exists): affected docs "
                "may be unassigned. Re-run update_batch with the same "
                "pages to heal, or delete the marker to accept the "
                "partial state."
            )

    def _resolved_for(
        self, ids: DataFrame, mm: DataFrame | None
    ) -> DataFrame:
        """Merge-resolved (doc_id, cluster_id) for the given doc_ids ONLY,
        reading just the assignments shard partitions those ids hash into
        (partition filter pushed to the scan) — batch operations never
        scan the full ingest history (the merge_batch pruning pattern,
        streaming/ingest.py)."""
        a = self._live("assignments")
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
        out = self._apply_closure(a, mm)
        if self._known_exclude is not None:
            # update window: the docs being re-versioned are NOT old docs
            # — their still-stored (pre-flip) assignment rows must not
            # resolve, or a fresh-fresh edge between two changed docs
            # collapses to a self-loop of their old cluster and vanishes
            out = out.join(self._known_exclude, "doc_id", "left_anti")
        if self._assign_overlay is not None:
            # update window: relabeled members' NEW (post-split) labels
            # take precedence over their still-stored old rows
            ov = self._assign_overlay.join(
                ids.select("doc_id").distinct(), "doc_id", "left_semi"
            )
            out = out.join(ov.select("doc_id"), "doc_id", "left_anti").unionByName(
                ov.select("doc_id", "cluster_id")
            )
        return out

    def _known_ids(self, shards: list[int]) -> DataFrame:
        """doc_ids already assigned, read from the given shard partitions
        only — the redelivery guard needs membership, not labels, so no
        merge closure is applied."""
        a = self._live("assignments")
        if a is None:
            return self.spark.createDataFrame([], "doc_id long")
        return a.filter(F.col("shard").isin(shards)).select("doc_id")

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
            # stored keys SHOULD be unique per (doc_id, ch, key); dedup
            # anyway so a crash between concurrent sigs/keys appends that
            # replays a doc's keys can never inflate bucket counts
            matched_old = matched_old.dropDuplicates(["doc_id", "ch", "key"])
            rows = bkeys.unionByName(matched_old)
        else:
            rows = bkeys
        rows = tracked_persist(rows)
        stats = tracked_persist(
            rows.groupBy("ch", "key").agg(
                F.count(F.lit(1)).alias("_n"), F.min("doc_id").alias("_rep")
            )
        )
        # metadata-scale gate (1-row agg over the persisted stats frame,
        # which downstream materializes anyway): batch-scale probes
        # usually have NO over-cap bucket, and skipping the star/hot-key
        # machinery then removes ~5 shuffles from the per-batch floor.
        # The over-cap path itself is byte-identical when taken.
        n_hot = stats.filter(
            F.col("_n") > cfg.max_bucket_docs
        ).count()
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
        if n_hot > 0:
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
            pr = pr.unionByName(star)
        agg = pr.groupBy("id_a", "id_b").agg(
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
        # over-cap minhash bucket keys back (operators/fused.py:86-98).
        # Skipped entirely when no bucket is over cap (n_hot gate) — the
        # correction is then identically zero.
        if n_hot > 0:
            hot_mh = stats.filter(
                (F.col("_n") > cfg.max_bucket_docs)
                & (F.col("ch") == CH_MINHASH)
            ).select("ch", "key")
            hot_docs = (
                rows.join(hot_mh, ["ch", "key"], "left_semi")
                .groupBy("doc_id")
                .agg(F.collect_set("key").alias("_hk"))
            )
            ha = hot_docs.select(
                F.col("doc_id").alias("id_a"), F.col("_hk").alias("_hk_a")
            )
            hb = hot_docs.select(
                F.col("doc_id").alias("id_b"), F.col("_hk").alias("_hk_b")
            )
            agg = (
                agg.join(ha, "id_a", "left")
                .join(hb, "id_b", "left")
                .withColumn(
                    "_mh_cnt",
                    F.col("_mh_cnt")
                    + F.when(
                        F.col("_hk_a").isNotNull()
                        & F.col("_hk_b").isNotNull(),
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
        sel = [
            F.col("id_a"),
            F.col("id_b"),
            F.col("channels"),
            mh_overlap.cast("int").alias("mh_overlap"),
            F.col("is_star"),
        ]
        if cfg.lsh_rows != 1:
            # exact band co-occurrence count — the prefilter's r>1
            # necessary-condition floor (see fused.py / verify.py)
            sel.append(
                F.when(F.col("_mh_any"), F.col("_mh_cnt"))
                .cast("int")
                .alias("band_hits")
            )
        return (
            scored.withColumn("channels", channels)
            .filter(F.size("channels") > 0)
            .select(*sel)
        )

    def _sim_lookup(self, fresh: DataFrame) -> DataFrame:
        """(doc_id, simhash) for fresh delegates ∪ the stored corpus."""
        sims = fresh.select("doc_id", "simhash")
        old_sigs = self._cur_sigs()
        if old_sigs is not None:
            sims = sims.unionByName(old_sigs.select("doc_id", "simhash"))
        return sims

    def _endpoint_reps(
        self, pairs: DataFrame, fresh: DataFrame, old_sigs: DataFrame | None
    ) -> DataFrame:
        """Delegate rows (incl. text) for exactly the docs appearing as
        pair endpoints — the only corpus rows the verify join ships.
        Returned LAZY; the caller picks persist vs plan barrier."""
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
        return reps

    def _verified_fuzzy(
        self,
        cands: DataFrame,
        fresh: DataFrame,
        old_sigs: DataFrame | None,
    ) -> DataFrame:
        """prefilter -> degree cap -> exact verification: the shared tail
        of add_batch's probe and update_batch's member relabel. Returns
        verified (src, dst) edges.

        PLAN BARRIERS (capped/reps_act localCheckpoints): the batch runs
        as ONE lazy tree (the full pipeline truncates lineage at durable
        checkpoints; there are none here) — without a cut the CC rounds
        re-plan the whole tree and AQE's per-update plan stringification
        alone goes super-linear (measured: a 2-doc batch hung 10+ minutes
        in explainString)."""
        cfg = self.cfg
        if cfg.lsh_rows == 1:
            filtered, _pre = verify.prefilter_candidates(
                cands, None, overlap_from_bands=True
            )
            capped, _cap = verify.cap_candidate_degree(
                filtered, cfg.verify_degree_cap
            )
            capped = capped.localCheckpoint(eager=True)
            # shallow subtrees from here on — persist, don't barrier
            reps_act = tracked_persist(
                self._endpoint_reps(capped, fresh, old_sigs)
            )
        else:
            reps_act = self._endpoint_reps(
                cands, fresh, old_sigs
            ).localCheckpoint(eager=True)
            # r>1: banding is the precision screen — skip the signature
            # prefilter entirely (see pipeline._candidates r>1 comment);
            # every surviving pair is exact-Jaccard-verified below.
            if "band_hits" in cands.columns:
                cands = cands.drop("band_hits")
            capped, _cap = verify.cap_candidate_degree(
                cands, cfg.verify_degree_cap
            )
            capped = capped.localCheckpoint(eager=True)
        return verify.verify_edges(capped, reps_act, cfg).select("src", "dst")

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
        if self._known_exclude is None:  # inside update_batch the marker is ours
            self._check_inflight()
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        # NOTE (measured, r4): disabling AQE for the batch window was
        # tried to cut the ~170-small-job driver overhead and made the
        # batch 2.6x SLOWER (labels phase 13.5s -> 333s job-wall): AQE's
        # exchange reuse dedups the repeated subplan references that the
        # batch's single lazy tree creates. Keep AQE on.
        try:
            return self._add_batch_inner(pages)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    def add_batches(self, batches: list[DataFrame]) -> DataFrame:
        """Drain a QUEUE of pending batches in ONE classification action.

        The per-batch cost is dominated by a fixed floor of small jobs
        and plan barriers (measured: ~40-55 s regardless of batch size at
        10k-doc scale — scripts/incr_profile.py), so when ingest falls
        behind and k batches are queued, classifying their union costs
        ~1 floor instead of k floors. Semantically free: add_batch label
        parity with the monolithic run holds for ANY batch partitioning
        of the corpus (tests pin sequential == coalesced == monolithic),
        because classification is against the index state plus the whole
        in-flight batch. The one visible difference: when the SAME url
        appears in two queued batches with different content, coalescing
        resolves it deterministically (lowest text_sha wins — the
        in-batch dedup rule) rather than by arrival order; a re-crawl
        that must override needs update_batch either way.

        Reference analog: pipe mode accumulates however much input is
        buffered into one segment run rather than one run per write()
        (/root/reference/pcompress.c pipe path; rabin/global/index.c
        segment accumulation)."""
        batches = [b for b in batches if b is not None]
        if not batches:
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        u = batches[0]
        for b in batches[1:]:
            u = u.unionByName(b)
        return self.add_batch(u)

    def _phase(self, name: str) -> None:
        """Tag subsequent jobs (thread-inheritable) so the Spark UI / REST
        API attributes per-phase wall to the batch sections — the floor
        profile `scripts/incr_profile.py` reads these. Costless."""
        try:
            self.spark.sparkContext.setJobDescription(name)
        except Exception:
            pass

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
            # Barriers are a material part of the per-batch FIXED cost
            # (~25 small jobs measured in r3), so the batch runs exactly
            # three of them — sigs, classified, capped — plus the lazy
            # pre-CC cut; everything else is persist-backed and
            # materializes inside a job that was running anyway.
            self._phase("incr:read-index")
            old_sigs = self._cur_sigs()
            old_keys = self._cur_keys()
            mm = self._merge_closure()

            # ---- phase A: identity columns only (codegen — the sketch
            # UDF is NOT paid yet). One light aggregation collects the
            # batch's assignment shards AND its row count (shuffle
            # sizing); in-batch url dedup (deterministic: lowest text_sha
            # wins — one doc_id must never yield two sig rows) and the
            # redelivery anti-join then run BEFORE attach_sigs, so a
            # redelivered batch never pays an Arrow batch.
            from pyspark.sql import Window

            self._phase("incr:identity")
            base = exact.base_ids(pages)
            shard_counts = (
                base.groupBy(
                    F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS))
                    .cast("int")
                    .alias("s")
                )
                .count()
                .collect()
            )
            n_raw = sum(r["count"] for r in shard_counts)
            if n_raw == 0:
                return spark.createDataFrame([], _ASSIGN_SCHEMA)
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(16, min(1024, n_raw // 400))),
            )
            known = self._known_ids([r["s"] for r in shard_counts])
            if self._known_exclude is not None:
                # update window: docs being re-versioned must NOT be
                # skipped by the redelivery guard — they are the batch
                known = known.join(self._known_exclude, "doc_id", "left_anti")
            w = Window.partitionBy("doc_id").orderBy("text_sha")
            sigs = exact.attach_sigs(
                base.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .join(known, "doc_id", "left_anti"),
                cfg,
            ).localCheckpoint(eager=True)
            n_batch = sigs.count()
            if n_batch == 0:  # fully re-delivered batch: nothing to do
                return spark.createDataFrame([], _ASSIGN_SCHEMA)
            groups = exact.text_groups(sigs)
            breps = exact.representatives(sigs, groups)

            # ---- tier 1: identity vs corpus (sha join against delegates).
            # A SELF-match (old delegate id == this doc id) means a prior
            # delivery crashed after the sigs/keys appends but before the
            # assignments commit: the doc's index state exists but it was
            # never classified. Such docs re-enter the fresh/probe path
            # (their keys are probed from the OLD side and their sigs are
            # NOT re-appended), which makes the append sequence
            # crash-recoverable rather than merely idempotent.
            # ONE barrier materializes delegate-with-match `classified`;
            # recovery_ids / ident / fresh are cheap filters over it.
            self._phase("incr:classify")
            if old_sigs is not None:
                old_ident = old_sigs.select(
                    "text_sha", F.col("doc_id").alias("old_id")
                )
                classified = breps.join(
                    old_ident, "text_sha", "left"
                ).localCheckpoint(eager=True)
            else:
                classified = breps.withColumn(
                    "old_id", F.lit(None).cast("long")
                ).localCheckpoint(eager=True)
            recovery_ids = classified.filter(
                F.col("old_id") == F.col("doc_id")
            ).select("doc_id")
            true_matched = classified.filter(
                F.col("old_id").isNotNull() & (F.col("old_id") != F.col("doc_id"))
            )
            old_res = self._resolved_for(
                true_matched.select(F.col("old_id").alias("doc_id")), mm
            ).withColumnRenamed("doc_id", "old_id")
            ident = tracked_persist(
                true_matched.select("doc_id", "old_id")
                .join(old_res, "old_id")
                .select("doc_id", F.col("cluster_id").alias("old_cluster"))
            )
            fresh = classified.filter(
                F.col("old_id").isNull() | (F.col("old_id") == F.col("doc_id"))
            ).drop("old_id")

            # ---- tier 2+3: bipartite probe of the key index. Pairs with
            # at least one fresh endpoint are built DIRECTLY from a
            # fresh-side bucket join against the STORED corpus keys — no
            # old-old pairs are ever generated and no old doc's
            # signatures/anchors are recomputed (a first version ran the
            # full fused self-join over fresh ∪ touched and measured
            # barely faster than rerunning the corpus: on a
            # boilerplate-rich 100k corpus a 10k batch touches ~everything)
            self._phase("incr:probe")
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
            self._phase("incr:verify")
            fuzzy = tracked_persist(
                self._verified_fuzzy(cands, fresh, old_sigs)
            )

            # ---- component labels over the batch-touched subgraph, old
            # endpoints relabeled to their resolved cluster ids (pruned
            # lookup: only the fuzzy endpoints' shards are read; its
            # shard-collect job is also what materializes `fuzzy`)
            self._phase("incr:labels")
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
            # lazy pre-CC cut: cluster_labels' gating count() is the job
            # that materializes it. Batch-touched edge sets are batch-
            # scale, so the driver union-find path almost always applies;
            # a giant batch falls back to the distributed loop unchanged.
            edges = (
                _to_cluster(_to_cluster(fuzzy, "src"), "dst")
                .unionByName(exact_e)
                .unionByName(ident_e)
            ).localCheckpoint(eager=False)
            labels = tracked_persist(cluster_labels(edges))

            # merges: an old-cluster node whose component min undercuts
            # it. Only clusters of TOUCHED old docs (fuzzy endpoints or
            # identity targets) can appear as CC nodes, so the candidate
            # set needs no full-history scan — merge rows are
            # metadata-scale (bounded by clusters bridged per batch),
            # collected once instead of isEmpty()+write double actions.
            old_clusters = (
                old_map.select(F.col("cluster_id").alias("doc_id"))
                .unionByName(ident.select(F.col("old_cluster").alias("doc_id")))
                .distinct()
            )
            merge_rows = (
                labels.join(old_clusters, "doc_id", "left_semi")
                .filter(F.col("cluster_id") != F.col("doc_id"))
                .select(
                    F.col("doc_id").alias("old_cluster"),
                    F.col("cluster_id").alias("new_cluster"),
                )
                .collect()
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
            # merges/sigs/keys first (CONCURRENTLY — they are independent
            # appends and any crash-subset of them is recoverable, see
            # below), then the assignments append LAST as the commit
            # record. A crash before the assignments append leaves docs
            # whose index state exists but who were never classified —
            # exactly what the identity tier's SELF-match recovery path
            # re-classifies on redelivery without re-appending (and the
            # keys-without-sigs subset simply re-enters fresh; its
            # replayed key rows are deduped at probe time). A crash after
            # it is a completed batch (redelivery anti-joins to empty).
            # Recovery-path docs are excluded from the appends: their
            # sigs/keys are already in the index.
            self._phase("incr:appends")
            from concurrent.futures import ThreadPoolExecutor

            # identity-membership links: every non-delegate batch doc ->
            # the delegate whose text it equals (in-batch members follow
            # their batch rep; if that rep identity-matched an OLD
            # delegate, both it and its members link to the old one).
            # update_batch reads these to rebuild exact edges when a
            # delegate's content changes. Duplicate link rows from a
            # redelivered crash window are tolerated by every consumer.
            members_l = (
                sigs.join(groups.select("text_sha", "rep_id"), "text_sha")
                .filter(F.col("doc_id") != F.col("rep_id"))
                .select("doc_id", F.col("rep_id").alias("_brep"))
            )
            parent_map = classified.select(
                F.col("doc_id").alias("_brep"),
                F.coalesce(
                    F.when(
                        F.col("old_id") != F.col("doc_id"), F.col("old_id")
                    ),
                    F.col("doc_id"),
                ).alias("parent_id"),
            )
            link_rows = (
                members_l.join(parent_map, "_brep")
                .select("doc_id", "parent_id")
                .unionByName(
                    true_matched.select(
                        "doc_id", F.col("old_id").alias("parent_id")
                    )
                )
            )

            def _w_merges() -> None:
                if merge_rows:
                    spark.createDataFrame(
                        merge_rows, _MERGE_SCHEMA
                    ).write.mode("append").parquet(self._p("merges"))

            def _w_sigs() -> None:
                self._with_ver(
                    fresh.join(recovery_ids, "doc_id", "left_anti"), "sigs"
                ).write.mode("append").parquet(self._p("sigs"))

            def _w_keys() -> None:
                self._append_keys(
                    bkeys.join(recovery_ids, "doc_id", "left_anti")
                )

            def _w_links() -> None:
                self._append_links(link_rows)

            with ThreadPoolExecutor(max_workers=4) as ex:
                for fut in [
                    ex.submit(f)
                    for f in (_w_merges, _w_sigs, _w_keys, _w_links)
                ]:
                    fut.result()
            self._write_assignments(batch_assign, mode="append")
            return batch_assign

    # --------------------------------------------------------- update_batch
    def update_batch(self, pages: DataFrame) -> DataFrame:
        """Re-crawl upsert: classify a batch in which some urls are
        ALREADY indexed but their content changed (the case add_batch
        deliberately skips). For each changed doc the old membership is
        tombstoned, its cluster's remaining members are relabeled — with
        genuine SPLITS handled by re-verifying the member subgraph from
        the stored sigs/keys — and the new content is classified exactly
        like a fresh doc (it may rejoin the same cluster, join another,
        or stand alone). Unknown urls ingest normally; known-unchanged
        rows are no-ops. Returns the (re)classified batch docs'
        (doc_id, cluster_id).

        Identity groups survive delegate updates by PROMOTION: when a
        changed doc was the delegate of an exact-dup group, the smallest
        remaining member is promoted to delegate, inheriting the old
        content's sig/key rows (the content still exists in the corpus —
        only the crawler's copy under that url changed).

        Commit protocol (the closest an append-only parquet store gets to
        the table format's atomic snapshot): every new row is appended at
        each doc's NEXT version — invisible, because a row is live only
        when its ver EQUALS the doc's current version — and one final
        tombstone append flips all touched versions at once. A crash
        before the flip leaves only invisible orphans plus the inflight
        marker; readers fail loudly on the marker (reference analog:
        pcompress refuses mismatched archive updates, pcompress.c
        metadata checks), and re-running update_batch with the same pages
        heals — detection reads only committed state, and the re-run
        writes at a version above the orphans'. Merge-log rows from the
        classification step are the one pre-commit-visible write:
        duplicates across a heal are idempotent in the closure, and a
        dangling row is unreachable once the update commits.

        Parity contract (tests/test_incremental.py): after update_batch,
        assignments() equals a monolithic pipeline run over the updated
        corpus, at default caps (the add_batch cap caveat in the module
        docstring applies here identically)."""
        spark = self.spark
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            return self._update_batch_inner(pages)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            self._pending_vers = None
            self._sigs_overlay = None
            self._keys_overlay = None
            self._assign_overlay = None
            self._known_exclude = None

    def _update_batch_inner(self, pages: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        cfg, spark = self.cfg, self.spark
        fs = self._fs()
        with CacheScope():
            # ---- detect: batch identity vs CURRENT content per doc.
            # Delegates carry their own sha; identity-dup docs carry their
            # parent delegate's (texts equal by construction).
            base = exact.base_ids(pages)
            w = Window.partitionBy("doc_id").orderBy("text_sha")
            base = (
                base.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .localCheckpoint(eager=True)
            )
            live_sigs = self._live("sigs")
            if live_sigs is None:
                return self.add_batch(pages)
            live_links = self._live("links")
            cur = live_sigs.select("doc_id", F.col("text_sha").alias("_cur"))
            links_dd = None
            if live_links is not None:
                # crash-window duplicate link rows are expected; one row
                # per doc is the contract for every consumer below
                links_dd = live_links.dropDuplicates(["doc_id"]).localCheckpoint(
                    eager=True
                )
                cur = cur.unionByName(
                    links_dd.join(
                        live_sigs.select(
                            F.col("doc_id").alias("parent_id"),
                            F.col("text_sha").alias("_cur"),
                        ),
                        "parent_id",
                    ).select("doc_id", "_cur")
                )
            cls = base.join(cur, "doc_id", "left").localCheckpoint(eager=True)
            changed = cls.filter(
                F.col("_cur").isNotNull() & (F.col("_cur") != F.col("text_sha"))
            )
            # changed-doc set stays a DataFrame end-to-end — no driver-
            # side id list, so a FULL re-crawl (every url changed) is a
            # join problem, not a driver OOM (r4 VERDICT task #3). The
            # count is a 1-row metadata-scale action gating both the
            # empty fast-path and the broadcast hint.
            chdf = (
                changed.select("doc_id").distinct().localCheckpoint(eager=True)
            )
            n_changed = chdf.count()
            if n_changed == 0:
                # nothing to upsert (or a healed re-run whose update
                # already committed): clear any marker, ingest the rest
                fs.delete(self._p("_update_inflight"))
                return self.add_batch(pages)
            if n_changed <= _UPDATE_BROADCAST_MAX:
                chdf = F.broadcast(chdf)
            to_classify = (
                cls.filter(
                    F.col("_cur").isNull()
                    | (F.col("_cur") != F.col("text_sha"))
                )
                .select("url", "text", "lang")
                .localCheckpoint(eager=True)
            )

            # ---- loud gate: marker up before any index write
            fs.delete(self._p("_update_inflight"))
            chdf.select("doc_id").coalesce(
                max(1, min(64, n_changed // 1_000_000 + 1))
            ).write.mode("overwrite").parquet(self._p("_update_inflight"))

            # ---- plan: affected clusters + members (committed state).
            # Affected-cluster ids likewise stay distributed: a semi-join
            # selects the members instead of an isin over a Python list.
            mm = self._merge_closure()
            aff_df = (
                self._resolved_for(chdf, mm)
                .select("cluster_id")
                .distinct()
                .localCheckpoint(eager=True)
            )
            if aff_df.count() <= _UPDATE_BROADCAST_MAX:
                aff_df = F.broadcast(aff_df)
            a_live = self._live("assignments")
            members = (
                self._apply_closure(
                    a_live.select("doc_id", "cluster_id"), mm
                )
                .join(aff_df, "cluster_id", "left_semi")
                .select("doc_id")
                .distinct()
                .localCheckpoint(eager=True)
            )
            members_minus = members.join(
                chdf, "doc_id", "left_anti"
            ).localCheckpoint(eager=True)

            # ---- promotion plan: changed delegates with surviving
            # identity children hand the old content's delegate role (and
            # sig/key rows) to the smallest child
            live_keys = self._live("keys")
            ch_deleg = live_sigs.join(chdf, "doc_id", "left_semi")
            promo_sigs = promo_keys = promo_links = None
            children = None
            if links_dd is not None:
                children = links_dd.join(
                    chdf.select(F.col("doc_id").alias("parent_id")),
                    "parent_id",
                    "left_semi",
                ).join(chdf, "doc_id", "left_anti")
                promo = children.groupBy("parent_id").agg(
                    F.min("doc_id").alias("new_rep")
                )
                promo_sigs = (
                    ch_deleg.join(
                        promo, ch_deleg["doc_id"] == promo["parent_id"]
                    )
                    .select(
                        F.col("new_rep").alias("doc_id"),
                        F.lit(None).cast("string").alias("url"),
                        "text_sha",
                        "lang",
                        "text",
                        "nshingles",
                        "minhash",
                        "simhash",
                    )
                    .localCheckpoint(eager=True)
                )
                promo_keys = (
                    live_keys.select("doc_id", "ch", "key")
                    .join(promo, live_keys["doc_id"] == promo["parent_id"])
                    .select(F.col("new_rep").alias("doc_id"), "ch", "key")
                    .dropDuplicates(["doc_id", "ch", "key"])
                    .localCheckpoint(eager=True)
                    if live_keys is not None
                    else None
                )
                promo_links = (
                    children.join(promo, "parent_id")
                    .filter(F.col("doc_id") != F.col("new_rep"))
                    .select("doc_id", F.col("new_rep").alias("parent_id"))
                    .localCheckpoint(eager=True)
                )
                children = children.localCheckpoint(eager=True)

            # ---- uncommitted versions: everything this update writes
            # goes at (per-doc raw max over every table) + 1, above both
            # committed state and any crashed attempt's orphans
            touched = chdf.select("doc_id").unionByName(
                members.select("doc_id")
            )
            if children is not None:
                touched = touched.unionByName(children.select("doc_id"))
            touched = touched.unionByName(
                base.join(cur, "doc_id", "left_anti").select("doc_id")
            )
            touched = touched.distinct().localCheckpoint(eager=True)
            maxes = []
            for name in ("sigs", "keys", "assignments", "links", "tombstones"):
                df = self._read(name)
                if df is not None and "ver" in df.columns:
                    maxes.append(
                        df.join(touched, "doc_id", "left_semi")
                        .groupBy("doc_id")
                        .agg(F.max("ver").alias("_mv"))
                    )
            mv = None
            for m in maxes:
                mv = m if mv is None else mv.unionByName(m)
            if mv is not None:
                mv = mv.groupBy("doc_id").agg(F.max("_mv").alias("_mv"))
                vnext = touched.join(mv, "doc_id", "left").select(
                    "doc_id",
                    (F.coalesce(F.col("_mv"), F.lit(0)) + 1).alias("_pv"),
                )
            else:
                vnext = touched.select(
                    "doc_id", F.lit(1).alias("_pv")
                )
            vnext = vnext.localCheckpoint(eager=True)
            self._pending_vers = F.broadcast(vnext)

            # ---- overlays: the post-update pre-classification corpus
            sigs_overlay = live_sigs.join(chdf, "doc_id", "left_anti")
            if promo_sigs is not None:
                sigs_overlay = sigs_overlay.unionByName(promo_sigs)
            keys_overlay = (
                live_keys.select("doc_id", "ch", "key").join(
                    chdf, "doc_id", "left_anti"
                )
                if live_keys is not None
                else None
            )
            if promo_keys is not None and keys_overlay is not None:
                keys_overlay = keys_overlay.unionByName(promo_keys)
            self._sigs_overlay = sigs_overlay
            self._keys_overlay = keys_overlay
            self._known_exclude = chdf

            # ---- relabel the remaining members of affected clusters:
            # re-verify their subgraph from stored sigs/keys (identity
            # edges from links, fuzzy edges re-verified) — a removed doc
            # can only SPLIT a component or change its min label, so the
            # member set is closed and the pass needs no corpus scan
            # beyond the members' own rows.
            D = tracked_persist(
                sigs_overlay.join(members_minus, "doc_id", "left_semi")
            )
            keysD = (
                keys_overlay.join(members_minus, "doc_id", "left_semi")
                .dropDuplicates(["doc_id", "ch", "key"])
                if keys_overlay is not None
                else None
            )
            id_edges = spark.createDataFrame([], "src long, dst long")
            if links_dd is not None:
                keep_links = links_dd.join(
                    members_minus, "doc_id", "left_semi"
                ).join(
                    chdf.select(F.col("doc_id").alias("parent_id")),
                    "parent_id",
                    "left_anti",
                )
                all_links = keep_links
                if promo_links is not None:
                    all_links = keep_links.unionByName(promo_links)
                id_edges = all_links.select(
                    F.col("doc_id").alias("src"),
                    F.col("parent_id").alias("dst"),
                )
            if keysD is not None:
                mcands = self._bipartite_candidates(
                    keysD.localCheckpoint(eager=True), D, None, cfg
                )
                fuzzy_m = self._verified_fuzzy(mcands, D, None)
            else:
                fuzzy_m = spark.createDataFrame([], "src long, dst long")
            edges_m = fuzzy_m.unionByName(id_edges).localCheckpoint(
                eager=False
            )
            labels_m = cluster_labels(edges_m)
            relabeled = tracked_persist(
                members_minus.join(labels_m, "doc_id", "left").withColumn(
                    "cluster_id", F.coalesce("cluster_id", "doc_id")
                )
            )
            relabeled.count()
            self._assign_overlay = relabeled

            # ---- invisible appends: promotion rows, member relabels,
            # then the fresh classification of changed/new content (its
            # own appends also land at the uncommitted versions)
            if promo_sigs is not None:
                self._with_ver(promo_sigs, "sigs").write.mode(
                    "append"
                ).parquet(self._p("sigs"))
            if promo_keys is not None:
                self._append_keys(promo_keys)
            if promo_links is not None:
                self._append_links(promo_links)
            self._write_assignments(relabeled, mode="append")
            out = self._add_batch_inner(to_classify)

            # ---- COMMIT: one tombstone append flips every touched doc's
            # version — exactly the (tbl, doc) pairs that either received
            # new rows (self-describing: raw rows found at the pending
            # version) or lost their content with no replacement
            flips = []
            for name in ("sigs", "keys", "assignments", "links"):
                df = self._read(name)
                if df is None or "ver" not in df.columns:
                    continue
                flips.append(
                    df.join(vnext, "doc_id")
                    .filter(F.col("ver") == F.col("_pv"))
                    .select(
                        F.lit(_TBL[name]).alias("tbl"), "doc_id", "_pv"
                    )
                    .distinct()
                )
            kills = chdf.select(
                F.lit(_TBL["sigs"]).alias("tbl"), "doc_id"
            ).unionByName(
                chdf.select(F.lit(_TBL["keys"]).alias("tbl"), "doc_id")
            ).unionByName(
                chdf.select(F.lit(_TBL["links"]).alias("tbl"), "doc_id")
            )
            if children is not None:
                kills = kills.unionByName(
                    children.select(
                        F.lit(_TBL["links"]).alias("tbl"), "doc_id"
                    )
                )
            tomb = kills.join(vnext, "doc_id").select("tbl", "doc_id", "_pv")
            for f in flips:
                tomb = tomb.unionByName(f)
            self._append_tombstones(
                tomb.distinct().withColumnRenamed("_pv", "ver")
            )
            fs.delete(self._p("_update_inflight"))
            return out
