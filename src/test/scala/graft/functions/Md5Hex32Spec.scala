package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native hash primitive must be value-identical to the interpreted
  * HOF spelling it replaced (first 8 md5 hex chars as an unsigned 32-bit
  * value) — that identity is what keeps every DuckDB oracle twin
  * matching without a single SQL change.
  */
class Md5Hex32Spec extends SparkSpec {

  private val hof =
    """aggregate(transform(sequence(0, 7), c ->
         shiftleft(CAST(instr('0123456789abcdef', substr(md5(CAST(s AS BINARY)), c + 1, 1)) - 1 AS BIGINT),
                   CAST(4 * (7 - c) AS INT))),
         CAST(0 AS BIGINT), (acc, x) -> acc + x)"""

  test("graft_md5h32 equals the md5-hex HOF on varied strings") {
    import spark.implicits._
    val samples = (0 until 500).map(i => s"mix_$i") ++
      Seq("", " ", "a", "√ünïcødé ≥ tokens", "x" * 4096)
    val df = samples.toDF("s")
      .withColumn("native", expr("graft_md5h32(s)"))
      .withColumn("ref", expr(hof))
    assert(df.filter(col("native") =!= col("ref")).isEmpty,
      "native hash must be bit-identical to the HOF spelling")
    // range sanity: unsigned 32-bit
    assert(df.filter(col("native") < 0 || col("native") > 4294967295L).isEmpty)
  }

  test("null propagates; codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(Some("k"), None).toDF("s")
      .withColumn("h", expr("graft_md5h32(s)"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1, "null in, null out")
    // force the interpreted path via eval on a fresh expression
    val v = org.apache.spark.sql.graftnative.Md5Hex32.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("k"))
    assert(rows.find(!_.isNullAt(1)).get.getLong(1) == v)
  }

  test("graft_md5w32: word 0 equals graft_md5h32; every word matches its hex slice") {
    import spark.implicits._
    // word i must assemble hex chars 8i+1..8i+8 of the digest — the same
    // contract Llm.md5SliceSql spells for the DuckDB oracles
    def sliceHof(i: Int) =
      s"""aggregate(transform(sequence(0, 7), c ->
           shiftleft(CAST(instr('0123456789abcdef', substr(md5(CAST(s AS BINARY)), ${8 * i} + c + 1, 1)) - 1 AS BIGINT),
                     CAST(4 * (7 - c) AS INT))),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
    val samples = (0 until 300).map(i => s"cm_$i") ++ Seq("", "√ü", "y" * 2048)
    var df = samples.toDF("s").withColumn("w", expr("graft_md5w32(s)"))
      .withColumn("h32", expr("graft_md5h32(s)"))
    (0 until 4).foreach { i => df = df.withColumn(s"ref_$i", expr(sliceHof(i))) }
    assert(df.filter(expr("element_at(w, 1)") =!= col("h32")).isEmpty,
      "word 0 must BE graft_md5h32")
    (0 until 4).foreach { i =>
      assert(df.filter(expr(s"element_at(w, ${i + 1})") =!= col(s"ref_$i")).isEmpty,
        s"word $i must equal its hex-slice spelling")
      assert(df.filter(expr(s"element_at(w, ${i + 1}) < 0 OR element_at(w, ${i + 1}) > 4294967295")).isEmpty,
        s"word $i must stay unsigned 32-bit")
    }
  }
}
