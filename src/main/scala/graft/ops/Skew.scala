package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (ARCHITECTURE §7): two-stage salted aggregation for
  * hot grouping keys. AQE's skew-join splitting handles skewed *joins*
  * automatically, but a single pathological group in an aggregation still
  * lands on one reducer; salting spreads it over `salts` partial groups,
  * then merges the algebraic partials. Cost: one extra (cheap) shuffle of
  * the already-reduced partials — worth it only for genuinely hot keys,
  * which is why it is a utility, not the default.
  */
object Skew {

  /** Deterministic salt derived from a row-varying column (not rand(): the
    * result must be reproducible run to run).
    */
  private def salt(on: Column, salts: Int): Column = pmod(hash(on), lit(salts))

  /** Salted equivalent of `df.groupBy(key).agg(count(*), sum(valueCol))`. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltOn: String, salts: Int): DataFrame =
    df.withColumn("_salt", salt(col(saltOn), salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as("sum_value"))
}
