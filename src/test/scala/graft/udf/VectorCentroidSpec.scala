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

  test("buffer merges associatively across partitions") {
    import spark.implicits._
    val data = (1 to 1000).map(i => Array(i.toDouble, 2.0 * i))
    val ds = spark.createDataset(data).repartition(7)
    val centroid = udaf(VectorCentroid)
    val c = ds.agg(centroid(col("value")).as("c")).collect()(0).getSeq[Double](0)
    assert(math.abs(c(0) - 500.5) < 1e-9 && math.abs(c(1) - 1001.0) < 1e-9)
  }
}
