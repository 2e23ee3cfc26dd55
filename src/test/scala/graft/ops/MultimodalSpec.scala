package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("assets carry payload + typed metadata for every document") {
    val a = Multimodal.assets(spark, sf)
    val n = graft.Tables(spark, sf, "documents").count()
    assert(a.count() == n)
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.filter(col("n_bytes") <= 0 || col("magic").isNull).isEmpty)
    assert(a.select("format").distinct().count() == 3)
  }

  test("decodeFeatures: batched decode emits fixed-dim vectors, deterministic") {
    val f1 = Multimodal.decodeFeatures(spark, sf, dim = 8).collect()
    assert(f1.nonEmpty)
    assert(f1.forall(_.features.length == 8))
    val f2 = Multimodal.decodeFeatures(spark, sf, dim = 8).collect()
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    // stub decode is a real function of the bytes: payloads differ → most
    // feature vectors differ
    assert(f1.map(_.features.toSeq).distinct.length > f1.length / 2)
  }

  test("decodeStub folds every byte (feature sum == byte sum / 255)") {
    val payload = Array[Byte](0, 10, 20, 30, 40, 50)
    val f = Multimodal.decodeStub(payload, 4)
    val want = payload.map(b => (b & 0xff) / 255.0f).sum
    assert(math.abs(f.sum - want) < 1e-5)
  }

  test("resize clamps payload and recomputes metadata") {
    val r = Multimodal.resize(Multimodal.assets(spark, sf), targetBytes = 16)
    assert(r.filter(col("n_bytes") > 16).isEmpty)
  }

  test("frameSample bounds frames per asset and indexes them densely") {
    val fr = Multimodal.frameSample(
      Multimodal.assets(spark, sf).filter(col("format") === "video"),
      stride = 4, maxFrames = 5)
    val per = fr.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    assert(per.filter(col("n") > 5).isEmpty)
    assert(per.filter(col("mx") =!= col("n") - 1).isEmpty, "frame idx must be dense 0..n-1")
    assert(fr.filter(length(col("frame")) === 0).isEmpty)
  }
}
