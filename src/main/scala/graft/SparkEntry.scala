package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared operator (SURVEY §2), one Q each. */
  lazy val declared: Seq[Q] =
    ops.Relational.all ++ ops.Filters.all ++ ops.Joins.all ++
      ops.Aggregates.all ++ ops.Windows.all ++ ops.SortsSets.all ++
      ops.Scalars.all ++ ops.Etl.all ++ ops.Llm.all ++ ops.Curation.all ++
      ops.Multimodal.all ++ ops.AnnIndex.all ++ ops.Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(sql => q.name -> normalize(sql))).toMap

  /** Collapse the multi-line triple-quoted SQL into single-line text so the
    * JSON the driver reads stays simple. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
