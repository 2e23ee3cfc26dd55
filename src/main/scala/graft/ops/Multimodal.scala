package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder brief / SURVEY §2.11): image/audio/video are
  * opaque `binary` columns with typed metadata travelling next to them.
  *
  * The fixtures ship no real media, so the payload is synthesized
  * deterministically from `documents.text` (cast to binary) — the point is
  * the Spark-side plumbing: schema shape, per-partition batched decode,
  * metadata propagation, frame explosion. The decode itself is a
  * clearly-marked stub (see [[Multimodal.decodeStub]]); swapping in a real
  * JNI/ffmpeg/JPEG decoder changes one function, not the pipeline.
  *
  * Scale design: decode/feature-extract runs inside `mapPartitions` (the
  * Scala analogue of arrow-batched `mapInPandas`) so the expensive step is
  * executor-parallel, streams partition iterators without materializing
  * them, and never touches the driver. Frame sampling bounds output
  * cardinality by `maxFrames`, so the explode cannot amplify 100 TB of
  * video into an unbounded row count.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  final case class AssetMeta(doc_id: Long, format: String, n_bytes: Long, magic: String)

  /** Typed decoded-feature row produced by the batched decode stage. */
  final case class AssetFeatures(
      doc_id: Long, format: String, n_bytes: Long, features: Array[Float])

  /** Assets table: opaque payload + typed metadata columns. Format is
    * assigned deterministically (doc_id mod 3) since the corpus carries no
    * real media type.
    */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' " +
          "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("format"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("magic", expr("substr(hex(payload), 1, 8)"))

  /** STUB — stands in for the real media decoder (libjpeg/ffmpeg/...),
    * which is not present in this container. Deterministic: folds payload
    * bytes into `dim` float accumulators. The real implementation would
    * decode pixels/samples here and emit genuine features; everything
    * around it (batching, schema, partitioning) is production-shaped.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Batched per-partition decode + feature extraction. */
  def decodeFeatures(s: SparkSession, dir: String, dim: Int = 8): Dataset[AssetFeatures] = {
    import s.implicits._
    assets(s, dir)
      .select(col("doc_id"), col("payload"), col("format"), col("n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { batch =>
        // One decoder instance per partition (a real decoder would be
        // expensive to construct — this is where it would be reused).
        batch.map { case (id, payload, fmt, n) =>
          AssetFeatures(id, fmt, n, decodeStub(payload, dim))
        }
      }
  }

  /** Resize stub: clamps the payload to `targetBytes` (a real image resize
    * would re-encode; metadata is recomputed either way).
    */
  def resize(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("payload", expr(s"substring(payload, 1, $targetBytes)"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** Frame sampling: every `stride`-th 16-hex-char block of the payload is
    * "a frame", capped at `maxFrames` — the bounded-output explode shape
    * real video frame-sampling needs at scale.
    */
  def frameSample(df: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    val block = 16 * stride
    df.withColumn("hx", hex(col("payload")))
      .withColumn("nf", expr(s"least(CAST(length(hx) DIV $block AS INT), $maxFrames)"))
      .filter(col("nf") >= 1) // guard: sequence(0, -1) would step backward
      .withColumn("frame_idx", explode(expr("sequence(0, nf - 1)")))
      .withColumn("frame", expr(s"substr(hx, frame_idx * $block + 1, 16)"))
      .drop("hx", "nf")
  }

  // ------------------------------------------------------------ t2 queries

  private val qMultimodalMeta = Q(
    "q_multimodal_meta",
    (s, dir) =>
      assets(s, dir)
        .select(col("doc_id"), col("format"), col("n_bytes"), col("magic"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
            CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
            substr(hex(CAST(text AS BLOB)), 1, 8) AS magic
            FROM documents ORDER BY doc_id"""))

  private val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, dir) =>
      frameSample(assets(s, dir).filter(col("format") === "video"), stride = 4, maxFrames = 5)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"), col("frame"))
        .orderBy("doc_id", "frame_idx"),
    Some("""WITH v AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx
                       FROM documents WHERE doc_id % 3 = 2)
            SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
                   substr(hx, CAST(i * 64 + 1 AS INT), 16) AS frame
            FROM v, unnest(range(0, least(length(hx) // 64, 5))) u(i)
            ORDER BY doc_id, frame_idx"""))

  /** Exact content dedup over the binary payload — the "same image
    * uploaded twice" story, format-scoped (an image dup of an audio
    * payload is not a dup). Payloads are keyed by md5 of their hex form
    * (string-md5 parity between the engines is already load-bearing in
    * §2.11), the min doc_id is elected per distinct payload, and the
    * per-format audit row carries a kept-id checksum pinning exact
    * survivor membership.
    *
    * Scale shape: two stacked hash aggregations, both map-side
    * combinable — (format, h) then format — so a payload duplicated a
    * million times combines inside each map task and the shuffle carries
    * one row per distinct payload per partition. No window, no join.
    */
  private val qMultimodalDedup = Q(
    "q_multimodal_dedup",
    (s, dir) =>
      assets(s, dir)
        .withColumn("h", md5(expr("CAST(hex(payload) AS BINARY)")))
        .groupBy("format", "h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
        .groupBy("format")
        .agg(
          sum("n").as("n_assets"),
          count(lit(1)).as("n_distinct"),
          (sum("n") - count(lit(1))).as("n_dups"),
          sum("keep_id").as("kept_id_sum"))
        .orderBy("format"),
    Some("""WITH a AS (SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
              md5(hex(CAST(text AS BLOB))) AS h
             FROM documents),
            g AS (SELECT format, h, COUNT(*) AS n, MIN(doc_id) AS keep_id
                  FROM a GROUP BY format, h)
            SELECT format, CAST(SUM(n) AS BIGINT) AS n_assets,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dups,
             CAST(SUM(keep_id) AS BIGINT) AS kept_id_sum
            FROM g GROUP BY format ORDER BY format"""))

  val all: Seq[Q] = Seq(qMultimodalMeta, qMultimodalFrames, qMultimodalDedup)
}
