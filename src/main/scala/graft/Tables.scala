package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver-provided parquet fixtures
  * (TESTDATA.md / FIXTURES.md).
  *
  * Critical environment bridge (SURVEY §2.0 D4): `events.ts` is physical
  * INT64 TIMESTAMP(NANOS) which Spark 4.1.2 refuses to read unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` is set — after which `ts`
  * reads as LongType epoch-nanoseconds. We set the conf before EVERY read
  * (it is a runtime SQLConf and harmless for the other tables) so no call
  * path can forget it.
  */
object Tables {
  /** All driver-provided tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with the ns→µs bridge applied: adds
    *  - `ts_us`  BIGINT epoch microseconds (canonical cross-engine value:
    *             DuckDB `epoch_us(ts)` equals this exactly), and
    *  - `ts_ts`  TimestampType (µs precision) for window()/date functions.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("ts_ts", expr("timestamp_micros(ts DIV 1000)"))
}
