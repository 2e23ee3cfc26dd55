package graft.udf

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.12 scalar-UDF surface: the extension point works, and the
  * same logic written with built-in expressions produces identical results
  * — which is why every declared query prefers built-ins (codegen'd,
  * Catalyst-optimizable; a Scala UDF is an opaque black box that blocks
  * pushdown through it and boxes every row).
  */
class ScalarUdfSpec extends SparkSpec {

  test("scalar UDF registers, runs, and matches its built-in twin") {
    val slug = udf((s: String) =>
      if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    spark.udf.register("graft_slug", slug)

    val viaUdf = Tables(spark, sf, "part")
      .select(col("p_partkey"), slug(col("p_name")).as("slug"))
    val viaBuiltin = Tables(spark, sf, "part")
      .select(col("p_partkey"),
        regexp_replace(lower(col("p_name")), "[^a-z0-9]+", "-").as("slug"))
    assert(viaUdf.exceptAll(viaBuiltin).isEmpty && viaBuiltin.exceptAll(viaUdf).isEmpty)

    // SQL-registered path
    val n = spark.sql(
      s"SELECT graft_slug(p_name) AS s FROM parquet.`$sf/part.parquet`")
      .filter(col("s").rlike("^[a-z0-9-]+$")).count()
    assert(n == Tables(spark, sf, "part").count())
  }

  test("null safety: the UDF passes nulls through instead of throwing") {
    val slug = udf((s: String) =>
      if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    import spark.implicits._
    val out = Seq(Some("Hello World"), None).toDF("s")
      .select(slug($"s").as("slug")).collect()
    assert(out(0).getString(0) == "hello-world" && out(1).isNullAt(0))
  }
}
