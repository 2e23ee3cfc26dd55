package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver-provided parquet fixtures
  * (TESTDATA.md / FIXTURES.md).
  *
  * Critical environment bridge (SURVEY §2.0 D4): the fixture generation
  * has shipped `events.ts` under TWO physical types across rounds —
  *  - INT64 TIMESTAMP(NANOS), which Spark 4.1.2 refuses to read unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (after which `ts` reads
  *    as LongType epoch-nanoseconds), and
  *  - plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
  *    reads as TIMESTAMP_NTZ (round 7's regenerated fixtures — the old
  *    `ts DIV 1000` bridge then fails analysis and took 26 queries down).
  * `events()` therefore dispatches on the RESOLVED Spark type, not on an
  * assumption about the file. We also pin the session timezone to UTC on
  * every read: the cross-engine contract is "naive wall-clock == UTC"
  * (DuckDB `epoch_us(ts)` on a naive timestamp), and an NTZ→LTZ cast uses
  * the session zone, so a non-UTC session would silently shift every
  * derived epoch value.
  */
object Tables {
  /** All driver-provided tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Epoch-microseconds bridge for an `events.ts` column of ANY of the
    * physical types the fixtures have shipped with. Canonical value:
    * DuckDB `epoch_us(ts)` equals this exactly at µs precision.
    */
  def tsUsExpr(tsType: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    tsType match {
      case LongType         => expr("ts DIV 1000")           // epoch-ns via nanosAsLong
      case TimestampNTZType => expr("unix_micros(cast(ts AS timestamp))") // session tz pinned UTC
      case TimestampType    => expr("unix_micros(ts)")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — extend Tables.tsUsExpr")
    }
  }

  /** `events` with the ts bridge applied: adds
    *  - `ts_us`  BIGINT epoch microseconds (canonical cross-engine value:
    *             DuckDB `epoch_us(ts)` equals this exactly), and
    *  - `ts_ts`  TimestampType (µs precision) for window()/date functions.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = apply(spark, sfDir, "events")
    raw
      .withColumn("ts_us", tsUsExpr(raw.schema("ts").dataType))
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
  }
}
