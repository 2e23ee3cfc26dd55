package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation matches direct aggregation on a skewed key") {
    import spark.implicits._
    // synthesize skew: 90% of rows on one user
    val skewed = Tables.events(spark, sf)
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10L)) < 9L, 7L).otherwise(col("user_id")))
    val direct = skewed.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCountSum(skewed, "user_id", "value", "event_id", 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1, s"count mismatch for $k")
      assert(math.abs(s - direct(k)._2) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("salting actually spreads the hot key across partial groups") {
    val skewed = Tables.events(spark, sf).withColumn("user_id", lit(7L))
    val partials = skewed
      .withColumn("_salt", pmod(hash(col("event_id")), lit(8)))
      .groupBy("user_id", "_salt").count()
    assert(partials.count() > 1, "hot key must split into multiple salted groups")
  }
}
