package graft.udf

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VectorCentroidSpec extends SparkSpec {

  test("centroid matches per-component avg computed with built-ins") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
      .select(col("label"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val centroid = udaf(VectorCentroid)
    val got = e.groupBy("label").agg(centroid(col("v")).as("c"))
      .select(col("label"), element_at(col("c"), 1).as("c0"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = e.select(col("label"), element_at(col("v"), 1).as("x"))
      .groupBy("label").agg(avg("x").as("c0"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, s"label $k") }
  }

  test("ragged vectors grow the accumulator instead of crashing") {
    import spark.implicits._
    // short vector first, longer after: the buffer must grow (missing
    // trailing elements count as 0), in reduce AND merge order variants.
    val data = Seq(Array(1.0), Array(1.0, 4.0), Array(1.0, 2.0, 9.0))
    val centroid = udaf(VectorCentroid)
    val c = spark.createDataset(data).repartition(3)
      .agg(centroid(col("value")).as("c")).collect()(0).getSeq[Double](0)
    assert(c.length == 3)
    assert(math.abs(c(0) - 1.0) < 1e-9)
    assert(math.abs(c(1) - 2.0) < 1e-9) // (0 + 4 + 2) / 3
    assert(math.abs(c(2) - 3.0) < 1e-9) // (0 + 0 + 9) / 3
  }

  test("scalar UDF extension point works (and built-ins stay preferred)") {
    // SURVEY §2.12: demonstrate udf() once. Every declared query uses
    // built-in expressions instead — they get codegen and Catalyst
    // optimization; a black-box UDF blocks both.
    val tag = udf((s: String, n: Long) => s"$s:$n")
    val got = Tables(spark, sf, "region")
      .select(tag(col("r_name"), col("r_regionkey").cast("long")).as("t"))
      .collect().map(_.getString(0)).sorted
    assert(got.nonEmpty && got.forall(_.matches(".+:\\d+")))
  }

  test("buffer merges associatively across partitions") {
    import spark.implicits._
    val data = (1 to 1000).map(i => Array(i.toDouble, 2.0 * i))
    val ds = spark.createDataset(data).repartition(7)
    val centroid = udaf(VectorCentroid)
    val c = ds.agg(centroid(col("value")).as("c")).collect()(0).getSeq[Double](0)
    assert(math.abs(c(0) - 500.5) < 1e-9 && math.abs(c(1) - 1001.0) < 1e-9)
  }
}
