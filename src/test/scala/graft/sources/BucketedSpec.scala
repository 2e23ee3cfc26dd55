package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed fact-fact join runs shuffle-free and matches unbucketed result") {
    Bucketed.write(Tables(spark, sf, "lineitem"), "li_b", "l_orderkey", 4)
    Bucketed.write(Tables(spark, sf, "orders"), "ord_b", "o_orderkey", 4)
    val joined = Bucketed.join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("o_totalprice"), col("l_extendedprice"))
    assert(Bucketed.isShuffleFree(joined),
      s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
    val expected = {
      val li = Tables(spark, sf, "lineitem")
      val o = Tables(spark, sf, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    }
    assert(joined.count() == expected)
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    assert(Bucketed.isShuffleFree(agg),
      s"groupBy on bucket key must not shuffle:\n${agg.queryExecution.executedPlan}")
  }
}
