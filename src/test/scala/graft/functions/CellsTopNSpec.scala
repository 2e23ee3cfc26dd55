package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins `graft_cells` to the HOF spelling it replaced across the IVF
  * family: the probe-cell ELECTION (the c_id sequence) must be
  * bit-identical on real data and on the degenerate inputs the fixture
  * never produces. The oracle hashes already pin the election through
  * nine queries end-to-end; this spec localizes a future divergence to
  * the expression itself.
  */
class CellsTopNSpec extends SparkSpec {

  private val hofSpelling =
    """slice(array_sort(transform(cents, c -> named_struct(
         'negcos', -round(graft_dot(v, c.cv) / (nrm * c.cn), 4),
         'c_id', c.c_id))), 1, 4)"""

  private def vecsWithCents = {
    register(spark)
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    // deterministic centroid subset (NOT limit(), which is plan-order
    // dependent); the id range keeps k ≈ 37 at the test SF
    val cents = e.filter(col("vec_id") < 37)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .agg(sort_array(collect_list(struct(col("c_id"), col("cv"), col("cn")))).as("cents"))
    e.crossJoin(broadcast(cents))
  }

  test("election-identical to the array_sort HOF spelling on real embeddings") {
    val both = vecsWithCents
      .withColumn("nat", expr("transform(graft_cells(v, nrm, cents, 4), p -> p.c_id)"))
      .withColumn("hof", expr(s"transform($hofSpelling, p -> p.c_id)"))
    val n = both.count()
    assert(n > 0, "fixture must produce rows")
    assert(both.filter(col("nat") =!= col("hof")).isEmpty,
      "native election must equal the HOF election on every vector")
  }

  test("degenerate inputs: zero-norm query (all-NaN cosines) and n > k") {
    register(spark)
    import spark.implicits._
    val cents = Seq((1L, Array(1.0, 0.0), 1.0), (2L, Array(0.0, 1.0), 1.0))
      .toDF("c_id", "cv", "cn")
      .agg(sort_array(collect_list(struct(col("c_id"), col("cv"), col("cn")))).as("cents"))
    val q = Seq((10L, Array(0.0, 0.0), 0.0), (11L, Array(3.0, 4.0), 5.0))
      .toDF("vec_id", "v", "nrm").crossJoin(broadcast(cents))
    val got = q.select(col("vec_id"),
        expr("transform(graft_cells(v, nrm, cents, 5), p -> p.c_id)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // zero norm → every cosine NaN → pure c_id tie-break, and n > k
    // returns exactly k cells
    assert(got(10L) == Seq(1L, 2L), s"NaN election must fall to c_id: ${got(10L)}")
    // real vector: closer to (0,1) than (1,0) (cos .8 vs .6)
    assert(got(11L) == Seq(2L, 1L), s"cosine order wrong: ${got(11L)}")
  }
}
