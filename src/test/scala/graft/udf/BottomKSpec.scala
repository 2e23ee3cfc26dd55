package graft.udf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {

  test("bottom-k keeps the k smallest distinct values, sorted") {
    import spark.implicits._
    val bk = udaf(new BottomK(4))
    val out = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 5L).toDF("v")
      .agg(bk($"v").as("s")).collect()(0).getSeq[Long](0)
    assert(out == Seq(1L, 2L, 3L, 5L))
  }

  test("fewer than k distinct values -> the full distinct set") {
    import spark.implicits._
    val bk = udaf(new BottomK(100))
    val out = Seq(5L, 5L, 2L, 8L).toDF("v")
      .agg(bk($"v").as("s")).collect()(0).getSeq[Long](0)
    assert(out == Seq(2L, 5L, 8L))
  }

  test("partial-aggregation merge across many partitions agrees with single-partition run") {
    import spark.implicits._
    val bk = udaf(new BottomK(16))
    val df = spark.range(0, 1000).select((pmod(hash($"id"), lit(10000))).cast("long").as("v"))
    val many = df.repartition(13).agg(bk($"v")).collect()(0).getSeq[Long](0)
    val one = df.coalesce(1).agg(bk($"v")).collect()(0).getSeq[Long](0)
    assert(many == one)
    assert(many.length == 16 && many == many.sorted && many.distinct == many)
  }

  test("bottom-k Jaccard estimate is exact when the union fits in k") {
    // two sets with known Jaccard 3/7; k=16 > |union|=7 -> exact
    val a = Array(1L, 2L, 3L, 4L, 5L)
    val b = Array(3L, 4L, 5L, 6L, 7L)
    val agg = new BottomK(16)
    val sa = a.foldLeft(agg.zero)(agg.reduce)
    val sb = b.foldLeft(agg.zero)(agg.reduce)
    val y = (sa ++ sb).distinct.sorted.take(16)
    val inter = y.count(v => sa.contains(v) && sb.contains(v))
    assert(inter.toDouble / y.length == 3.0 / 7.0)
  }
}
