package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Hive-style partitioned parquet layout — the OTHER half of the 100 TB
  * table-layout story next to [[Bucketed]]: directory partitioning on a
  * low-cardinality predicate column (route, event date) lets the planner
  * prune entire directories at compile time, so a query over one route /
  * one day reads that slice and nothing else. Bucketing co-locates joins;
  * partitioning prunes scans — production tables at scale use both
  * (`partitionBy(date).bucketBy(n, key)`).
  *
  * Write-side discipline encoded here:
  *  - partition columns must be low-cardinality (routes, dates — never
  *    user_id: millions of tiny directories kill the file system and the
  *    driver's listing);
  *  - `maxRecordsPerFile` bounds file size so a hot partition splits into
  *    several well-sized files instead of one huge one;
  *  - dynamic partition overwrite (set in the writer, not session-wide)
  *    replaces only the partitions present in the incoming batch — the
  *    idempotent-backfill contract an incremental 100 TB pipeline needs.
  */
object Partitioned {

  /** Write `df` partitioned by `cols` (dynamic overwrite: only incoming
    * partitions are replaced on re-run).
    */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Long, cols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Append `df` into an existing partitioned layout: new files land in
    * the partition directories their rows belong to, existing files are
    * never touched — the inverted-list / incremental-ingest append an
    * index-maintenance pipeline runs per batch (see `q_ann_index_update`).
    */
  def append(df: DataFrame, path: String, maxRecordsPerFile: Long, cols: String*): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Static-overwrite variant of [[write]]: truncates the WHOLE path
    * before writing, not just the incoming partitions. Used when the
    * artifact must be a pure function of this one write (e.g. the base
    * generation of an append lifecycle, where a dynamic overwrite could
    * leave stale delta files alive in partitions the base doesn't cover).
    */
  def writeStatic(df: DataFrame, path: String, maxRecordsPerFile: Long, cols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      // pinned per-writer like `write` does: a session-wide
      // partitionOverwriteMode=dynamic must not silently turn the
      // whole-path truncate into a partial one
      .option("partitionOverwriteMode", "static")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** True iff `df`'s scan prunes partitions down to `expected` of
    * `total` — i.e. the partition filter is applied at planning time, not
    * per-row. The proof used by the spec and available for ad-hoc audits.
    * Descends through `AdaptiveSparkPlanExec`: AQE wraps the physical
    * plan in an adaptive root whose scans `TreeNode.collect` cannot see
    * (it has no children in the tree sense), so a naive collect reports
    * "no scans" for any AQE-planned frame.
    */
  def prunesTo(df: DataFrame, expected: Int, total: Int): Boolean = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case s: FileSourceScanExec => s } ++
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => allScans(a.executedPlan))
    val scans = allScans(df.queryExecution.executedPlan)
    scans.nonEmpty && scans.forall { s =>
      s.metadata.get("PartitionFilters").exists(_.nonEmpty) &&
        s.selectedPartitions.partitionCount == expected &&
        expected < total
    }
  }
}
