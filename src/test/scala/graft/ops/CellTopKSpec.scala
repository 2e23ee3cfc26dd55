package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the bounded-Aggregator spelling of the shared IVF search tail
  * (`Llm.cellTopK`) frame-for-frame against the row_number-window
  * spelling it replaced — same join, same rounded cosine, same
  * (cos desc, n_id) ranking — on the real doc-ANN frames. The aggregator
  * exists for shuffle volume (≤ 3 rows per query cross the exchange
  * instead of every candidate pair); this spec proves the result
  * contract did not move.
  */
class CellTopKSpec extends SparkSpec {

  private def windowTopK(idx: DataFrame, qry: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    qry.join(idx, Seq("cell")).filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(graft.functions.graft_dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
      .select("q_id", "n_id", "cos")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "n_id", "cos")
  }

  test("aggregator top-3 equals the window top-3 on the capped doc-ANN frames") {
    val (idx0, qry0) = Llm.docIdxQry(spark, sf)
    val (idx, qry) = Llm.capCells(idx0, qry0, Llm.CellTarget)
    val agg = Llm.cellTopK(idx, qry)
    val win = windowTopK(idx, qry)
    assert(agg.count() > 0, "fixture must produce candidates")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregator and window spellings must emit identical (q_id, rnk, n_id, cos) rows")
  }

  test("aggregator top-3 equals the window top-3 on synthetic skewed candidates") {
    // one hot cell (many candidates per query) + cells with < 3
    // candidates, exercising the under-full buffer path and merge order
    import spark.implicits._
    val idx = (1L to 200L).map(i => (i % 5, i, Array.fill(4)(((i * 7) % 13).toDouble + 1), 1.0))
      .toDF("cell", "n_id", "nv", "nn")
    val qry = (1L to 40L).map(i => (i % 7 % 5, 1000L + i, Array.fill(4)(((i * 11) % 17).toDouble + 1), 1.0))
      .toDF("cell", "q_id", "qv", "qn")
    val agg = Llm.cellTopK(idx, qry)
    val win = windowTopK(idx, qry)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "spellings must agree on skewed synthetic frames")
  }
}
