package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BoundedPosExplodeSpec extends SparkSpec {

  private def firstK(k: Int) =
    Tables(spark, sf, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(col("pos") < k)

  test("rewrite fires: the generator explodes a slice, not the full array") {
    val opt = firstK(5).queryExecution.optimizedPlan.toString
    assert(opt.contains("slice("), s"expected slice under posexplode:\n$opt")
  }

  test("rewrite preserves results exactly (vs hand-sliced formulation)") {
    val viaRule = firstK(5)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col"))
      .orderBy("doc_id", "pos").collect()
    val manual = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        posexplode(expr("slice(split(text, ' '), 1, 5)")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col"))
      .orderBy("doc_id", "pos").collect()
    assert(viaRule.sameElements(manual))
    assert(viaRule.length > 0)
  }

  test("no false fire: filters on non-ordinal columns leave the plan alone") {
    val q = Tables(spark, sf, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(col("col") =!= "the")
    assert(!q.queryExecution.optimizedPlan.toString.contains("slice("))
  }

  test("no false fire: outer explode is never rewritten") {
    val q = Tables(spark, sf, "documents")
      .select(col("doc_id"), posexplode_outer(split(col("text"), " ")))
      .filter(col("pos") < 5)
    assert(!q.queryExecution.optimizedPlan.toString.contains("slice("))
  }
}
