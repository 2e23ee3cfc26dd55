package graft.ops

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-2 pipeline operators (SURVEY §2.1/§2.4/§2.5,
  * §2.11): deterministic sampling, histogram completeness, keep-latest
  * compaction, null-safe join totals, normalization canonical election.
  */
class PipelineOpsSpec extends SparkSpec {

  test("hash sample is deterministic and membership is a pure key function") {
    val a = SparkEntry.queries("q_scan_sample")(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = SparkEntry.queries("q_scan_sample")(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must be identical across runs")
    // Independent oracle: recompute membership with java.security md5,
    // not the query's own Spark expression (which would be tautological).
    def inSample(key: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) == 0
    }
    val expected = Tables(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).filter(inSample).toSet
    assert(a == expected, "sample must equal independently-computed membership")
    val total = Tables(spark, sf, "orders").count().toDouble
    assert(math.abs(a.size / total - 1.0 / 16) < 0.02,
      s"sample fraction ${a.size / total} far from 1/16")
  }

  test("histogram buckets partition the table and bound their contents") {
    val rows = SparkEntry.queries("q_agg_histogram")(spark, sf).collect()
    val total = Tables(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total, "bucket counts must sum to row count")
    rows.foreach { r =>
      val (bucket, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo <= hi)
      if (bucket >= 1 && bucket <= 12) {
        assert(lo >= (bucket - 1) * 50000.0 && hi < bucket * 50000.0,
          s"bucket $bucket contents [$lo,$hi] out of range")
      }
    }
  }

  test("keep-latest compaction returns exactly each user's max-ts event") {
    val latest = SparkEntry.queries("q_win_dedup_latest")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    val expected = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.ts_us"), col("m.event_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(latest == expected)
  }

  test("null-safe join drops no rows and groups the NULL key") {
    val rows = SparkEntry.queries("q_join_null_safe")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "<=> join must preserve every event, including NULL keys")
    val errorCount = Tables.events(spark, sf)
      .filter(col("event_type") === "error").count()
    val nullRow = rows.find(_.isNullAt(0))
    assert(nullRow.isDefined, "NULL key group must survive the join")
    assert(nullRow.get.getLong(1) == errorCount)
  }

  test("normalization is idempotent and elects one canonical doc per form") {
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", " "), " +", " "))
    val docs = Tables(spark, sf, "documents").withColumn("norm", norm)
    val notIdempotent = docs.withColumn("norm2",
        trim(regexp_replace(regexp_replace(lower(col("norm")), "[^a-z0-9 ]", " "), " +", " ")))
      .filter(col("norm") =!= col("norm2")).count()
    assert(notIdempotent == 0L, "normalize(normalize(x)) must equal normalize(x)")
    val out = SparkEntry.queries("q_text_normalize")(spark, sf).collect()
    val canonicalPerHash = out.filter(_.getBoolean(4)).groupBy(_.getString(1))
    assert(canonicalPerHash.forall(_._2.length == 1),
      "exactly one canonical doc per normalized hash")
    assert(canonicalPerHash.size == out.map(_.getString(1)).distinct.length)
  }
}
