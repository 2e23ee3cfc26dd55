package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonLinesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))

  test("jsonl round-trip: write then read returns the same rows") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    val dir = Files.createTempDirectory("jsonl-rt").toString
    JsonLines.write(docs, dir)
    val (good, dlq) = JsonLines.read(spark, dir, schema)
    assert(dlq.isEmpty, "clean write must produce no DLQ rows")
    assert(good.except(docs).isEmpty && docs.except(good).isEmpty,
      "round-trip must be lossless")
  }

  test("malformed lines land in the DLQ verbatim; good lines still parse") {
    val dir = Files.createTempDirectory("jsonl-dlq").toString
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "n_chars": 10}""",
      """{"doc_id": 2, "lang": "de"""", // truncated mid-object
      """not json at all""",
      """{"doc_id": 3, "lang": "fr", "n_chars": 7}""")
    Files.write(Paths.get(dir, "part-0.json"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (good, dlq) = JsonLines.read(spark, dir, schema)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = dlq.collect().map(_.getString(0)).toSet
    assert(bad == Set(lines(1), lines(2)),
      s"each malformed line must be quarantined verbatim: $bad")
    // the contract of the split: nothing dropped, nothing duplicated
    assert(good.count() + dlq.count() == lines.length)
  }
}
