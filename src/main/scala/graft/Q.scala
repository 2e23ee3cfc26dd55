package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator (SURVEY.md §2): a Spark implementation plus
  * an optional DuckDB oracle SQL over the same parquet tables. `oracle` is
  * None for ops whose output is not deterministically SQL-expressible in
  * DuckDB (SURVEY §2.0 D5) — the driver then records a weaker check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
