package graft.sources

import graft.{SparkSpec, Tables}
import graft.ops.Etl
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpec {

  private lazy val dir =
    Files.createTempDirectory("graft_part").toFile.getAbsolutePath

  private def writeEvents(): Unit =
    Partitioned.write(
      Etl.withRoute(Tables.events(spark, sf))
        .select("event_id", "user_id", "event_type", "value", "route"),
      s"$dir/events_by_route", maxRecordsPerFile = 100000L, "route")

  test("partitioned write + single-partition read prunes the scan") {
    writeEvents()
    val all = spark.read.parquet(s"$dir/events_by_route")
    val routes = all.select("route").distinct().count().toInt
    assert(routes >= 3, "fixture should produce several routes")
    val one = all.filter(col("route") === "analytics")
    assert(Partitioned.prunesTo(one, 1, routes),
      s"expected planning-time pruning to 1 of $routes partitions:\n" +
        one.queryExecution.executedPlan)
    // pruned read ≡ filtered full read
    val expected = Etl.withRoute(Tables.events(spark, sf))
      .filter(col("route") === "analytics").count()
    assert(one.count() == expected)
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    writeEvents()
    val path = s"$dir/events_by_route"
    val before = spark.read.parquet(path)
    val errorsBefore = before.filter(col("route") === "errors").count()
    val analyticsBefore = before.filter(col("route") === "analytics").count()
    assert(errorsBefore > 0 && analyticsBefore > 0)
    // overwrite ONLY the analytics partition with a 1-row batch
    Partitioned.write(
      before.filter(col("route") === "analytics").limit(1),
      path, maxRecordsPerFile = 100000L, "route")
    val after = spark.read.parquet(path)
    assert(after.filter(col("route") === "analytics").count() == 1,
      "incoming partition should be replaced")
    assert(after.filter(col("route") === "errors").count() == errorsBefore,
      "untouched partitions must survive a dynamic overwrite")
  }
}
