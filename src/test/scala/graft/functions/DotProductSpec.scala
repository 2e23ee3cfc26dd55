package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"

  test("bit-identical to the sequential HOF fold on real embeddings") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val diff = a.crossJoin(b.limit(50))
      .select((expr(hof) - graft_dot(col("va"), col("vb"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"native dot differs from HOF fold by $diff")
  }

  test("null semantics: null array → null; null elements skipped; short prefix") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)),
      (2L, null, Array[java.lang.Double](3.0, 4.0)),
      (3L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
      (4L, Array[java.lang.Double](1.0), Array[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), graft_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 11.0)
    assert(got(2L) == null)
    assert(got(3L) == 3.0) // null element contributes 0
    assert(got(4L) == 3.0) // shorter prefix
  }

  test("participates in whole-stage codegen") {
    val e = Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val plan = e.select(graft_dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // codegen'd stages render with a `*(n)` prefix in the plan string
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"expected graft_dot inside a codegen stage:\n$plan")
  }

  test("SQL registration makes graft_dot callable from spark.sql") {
    register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
