package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, DoubleType, StringType}
import java.nio.file.Files

/** Source/sink format coverage beyond parquet: CSV and JSON-lines
  * round-trips with explicit schemas (schema-on-read, no inference in the
  * read path — inference would be a full extra pass at 100 TB).
  */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderstatus", StringType)))

  private def orders =
    Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  test("csv round-trip with header and explicit read schema") {
    val dir = Files.createTempDirectory("fmt-csv").toString + "/orders"
    orders.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.schema == schema)
    assert(back.count() == orders.count())
    val sBack = back.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val sOrig = orders.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(math.abs(sBack - sOrig) <= 1e-4, s"csv round-trip changed sum: $sOrig -> $sBack")
  }

  test("json-lines round-trip with explicit read schema") {
    val dir = Files.createTempDirectory("fmt-json").toString + "/orders"
    orders.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == orders.count())
    assert(back.except(orders).isEmpty && orders.except(back).isEmpty)
  }

  test("orc round-trip is exact and prunes columns at the scan") {
    val dir = Files.createTempDirectory("fmt-orc").toString + "/orders"
    orders.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == orders.schema)
    assert(back.except(orders).isEmpty && orders.except(back).isEmpty)
    // ORC scans prune like parquet: a 2-column projection reads 2 columns
    val plan = back.select("o_orderkey", "o_totalprice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"orc scan did not prune:\n$plan")
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    // the lakehouse reality at 100 TB: a column added in generation 2 must
    // not break readers of the combined table; old files surface NULLs.
    val dir = Files.createTempDirectory("fmt-evolve").toString + "/orders"
    orders.limit(10).write.parquet(dir)                      // gen 1: 4 cols
    orders.limit(5)
      .withColumn("o_priority_rank", lit(7L))                // gen 2: +1 col
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_priority_rank"))
    assert(merged.count() == 15)
    // gen-1 rows read NULL for the new column; gen-2 rows keep their value
    assert(merged.filter(col("o_priority_rank").isNull).count() == 10)
    assert(merged.filter(col("o_priority_rank") === 7L).count() == 5)
  }
}
