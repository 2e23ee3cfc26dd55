package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `graft_sketch` must be BIT-IDENTICAL to the composable HOF spelling it
  * replaces (and hence to the DuckDB list twin, which is value-equal to
  * the HOF spelling by the q_sim_ann_lsh_probed oracle pass): same
  * sequential dot order, same >0 sign rule, same bit packing.
  */
class SignSketchSpec extends SparkSpec {

  private val Bits = 7
  private val Words = 3

  // the exact composable spelling lshSketch used before the native pass
  private def hofWord(w: Int): String =
    s"""aggregate(transform(sequence(0, ${Bits - 1}), r ->
          IF(aggregate(zip_with(v, element_at(pl, $w * $Bits + r + 1),
               (x, y) -> x * y), 0D, (acc, p) -> acc + p) > 0D,
             shiftleft(CAST(1 AS BIGINT), r), CAST(0 AS BIGINT))),
        CAST(0 AS BIGINT), (acc, x) -> acc + x)"""

  test("bit-identical to the HOF spelling on real embeddings") {
    val planes = Tables(spark, sf, "embeddings")
      .agg(max(size(col("embedding"))).as("d"))
      .select(expr(
        s"""transform(sequence(0, ${Words * Bits - 1}), t ->
              transform(sequence(0, d - 1), i ->
                CAST(graft_md5h32(concat('sks', CAST(t AS STRING), '_',
                  CAST(i AS STRING))) AS DOUBLE) / 2147483648.0D - 1.0D))""")
        .as("pl"))
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .crossJoin(broadcast(planes))
    val diff = e.select(
        expr(s"graft_sketch(v, pl, $Bits)").as("ks"),
        array((0 until Words).map(w => expr(hofWord(w))): _*).as("hs"))
      .filter(expr("ks <> hs"))
      .count()
    assert(diff == 0L, s"native sketch differs from the HOF spelling on $diff rows")
  }

  test("word count is numPlanes div bits; remainder planes dropped") {
    import spark.implicits._
    val df = Seq((Array(1.0, -1.0),
      Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0)))).toDF("v", "pl")
    val ks = df.select(expr("graft_sketch(v, pl, 2)").as("ks"))
      .collect()(0).getSeq[Long](0)
    // 3 planes / 2 bits = 1 word; plane 0 dot = 1 > 0 (bit 0), plane 1
    // dot = -1 (bit 1 clear); plane 2 is the dropped remainder
    assert(ks == Seq(1L), s"got $ks")
  }
}
