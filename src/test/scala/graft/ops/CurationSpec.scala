package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.14 training-set assembly invariants: planted contamination is
  * caught, mixture rebalancing hits its √-law target, the split is a
  * partition, packing conserves tokens and its two-phase numbering equals
  * one global window, and incremental dedup is idempotent.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  /** doc_ids partitioned by the operator's own benchmark-membership hash
    * (pmod(md5Hex32("dec_" + id), DecontBenchMod) == 0), so tests can
    * plant docs on a chosen side of the benchmark boundary without
    * replicating the hash math in Scala.
    */
  private def benchSplit(ids: Seq[Long]): (Seq[Long], Seq[Long]) = {
    val h = Llm.md5Hex32Spark("concat('dec_', CAST(id AS STRING))")
    val rows = ids.toDF("id")
      .withColumn("is_bench", expr(s"pmod($h, ${Curation.DecontBenchMod}) = 0"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    (rows.filter(_._2).map(_._1).toSeq, rows.filterNot(_._2).map(_._1).toSeq)
  }

  test("decontaminate: a training doc copying a benchmark doc is flagged; a disjoint one is not") {
    val (benchIds, trainIds) = benchSplit(1L to 60L)
    assert(benchIds.nonEmpty && trainIds.size >= 2)
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val cleanText = "completely unrelated words about maritime navigation charts"
    val docs = Seq(
      (benchIds.head, benchText),              // the benchmark doc
      (trainIds.head, benchText),              // contaminated train doc (verbatim copy)
      (trainIds(1), cleanText)                 // clean train doc
    ).toDF("doc_id", "text")
    val out = Curation.decontaminateFrom(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.contains(trainIds.head), "verbatim benchmark copy must be flagged")
    assert(out(trainIds.head) == 1.0, "all shingles of a verbatim copy overlap")
    assert(!out.contains(trainIds(1)), "disjoint doc must not be flagged")
    assert(!out.contains(benchIds.head), "benchmark docs are not scored")
  }

  test("decontaminate: over-cap boilerplate carries no contamination signal (declared trade)") {
    // one benchmark doc + ShingleDfCap+2 training docs all sharing its
    // exact text: every shingle's df exceeds the cap, so the whole
    // universe is dropped and NOTHING is flagged — the documented
    // contract (mass-dup is exact-dedup's job, not decontamination's)
    val (benchIds, trainIds) = benchSplit(1L to 200L)
    val boiler = "this exact same boilerplate sentence repeats on every single page here"
    val n = Llm.ShingleDfCap + 2
    assert(trainIds.size >= n)
    val docs = ((benchIds.head +: trainIds.take(n)).map(id => (id, boiler))).toDF("doc_id", "text")
    assert(Curation.decontaminateFrom(docs).isEmpty,
      "df-capped boilerplate must score zero hits by design")
  }

  test("mixture: √-law keep counts, small langs kept whole, deterministic membership") {
    // 400 'big' docs: p = 4/√400 = 0.2 → E[kept] = 80, σ = √(400·0.2·0.8) = 8.
    // 9 'small' docs: p = 4/3 > 1 → all kept.
    val docs = ((1L to 400L).map(i => (i, "big")) ++ (401L to 409L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    val out = Curation.mixtureFrom(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (bigN, bigKept, _) = out("big")
    assert(bigN == 400L)
    assert(bigKept >= 40 && bigKept <= 120, s"√-law target 80±5σ, got $bigKept")
    val (smallN, smallKept, _) = out("small")
    assert(smallN == 9L && smallKept == 9L, "p > 1 language must be kept whole")
    // determinism: identical checksum on a rerun (hash membership, no rand())
    val again = Curation.mixtureFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.view.mapValues(_._3).toMap == again)
  }

  test("split: every doc lands in exactly one split, fractions near 80/10/10") {
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Curation.splitFrom(docs).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == 1000L, "split must partition the corpus")
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(math.abs(bySplit("train") - 800L) <= 60, s"train ${bySplit("train")}")
    assert(math.abs(bySplit("val") - 100L) <= 40, s"val ${bySplit("val")}")
    assert(math.abs(bySplit("test") - 100L) <= 40, s"test ${bySplit("test")}")
  }

  test("pack: conserves tokens and chunks, sequences contiguous, ≤1 straddle each") {
    val ch = Llm.chunked(spark, sf)
    val out = Curation.packFrom(ch).collect()
    val chunkTotal = ch.agg(sum("n_tok_chunk"), count(lit(1))).head()
    assert(out.map(_.getLong(2)).sum == chunkTotal.getLong(0), "token conservation")
    assert(out.map(_.getLong(1)).sum == chunkTotal.getLong(1), "chunk conservation")
    // every non-final 128-token window contains ≥1 chunk start (chunks are
    // ≤32 < 128 tokens); the FINAL window may be covered entirely by a
    // chunk that started in the previous one, so ceil(total/SeqLen) windows
    // shrink to that or one fewer sequence rows — always contiguous from 0
    val ids = out.map(_.getLong(0)).sorted
    val expected = (chunkTotal.getLong(0) + Curation.SeqLen - 1) / Curation.SeqLen
    assert(ids.head == 0L && ids.last == ids.length - 1,
      "sequence ids must be contiguous from 0")
    assert(ids.length == expected || ids.length == expected - 1,
      s"got ${ids.length} sequences for ceil(total/SeqLen) = $expected")
    // at most one chunk can cross a given window's end boundary
    assert(out.map(_.getLong(4)).max <= 1L, "≤1 straddling chunk per sequence")
  }

  test("pack: two-phase sharded numbering equals one global window") {
    val ch = Llm.chunked(spark, sf)
    val u = Llm.md5Hex32Spark("concat('pack_', CAST(doc_id AS STRING))")
    val wG = Window.orderBy("u", "doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = ch.select("doc_id", "chunk_id", "n_tok_chunk")
      .withColumn("u", expr(u))
      .withColumn("offset", coalesce(sum("n_tok_chunk").over(wG), lit(0L)))
      .withColumn("seq_id", expr("offset DIV 128"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tok_chunk").as("n_tokens"))
    val got = Curation.packFrom(ch).select("seq_id", "n_chunks", "n_tokens")
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
      "sharded prefix sums must be byte-identical to the global window")
  }

  test("source cap: keeps exactly min(cap, n) per source, two-phase equals one window") {
    // construct a skewed corpus: one mega-source, several small ones
    val docs = ((1L to 500L).map(i => (i, "mega")) ++
      (501L to 520L).map(i => (i, "s1")) ++ (521L to 527L).map(i => (i, "s2")))
      .toDF("doc_id", "source")
    val out = Curation.sourceCapFrom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(out.map(t => t._1 -> (t._2, t._3)).toMap ==
      Map("mega" -> (500L, 15L), "s1" -> (20L, 15L), "s2" -> (7L, 7L)),
      s"n_kept must be min(cap, n_docs): $out")
    // one-phase reference: single per-source window over everything
    val u = Llm.md5Hex32Spark("concat('cap_', CAST(doc_id AS STRING))")
    val w = Window.partitionBy("source").orderBy("u", "doc_id")
    val ref = docs.withColumn("u", expr(u))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 15)
      .groupBy("source").agg(sum("doc_id").as("kept_id_sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(t => t._1 -> t._4).toMap == ref,
      "two-phase cap must elect the same docs as the one-window reference")
  }

  test("pack property: conservation + global-window equality on random chunk tables") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tableGen: Gen[List[(Long, Long, Long)]] = for {
      nDocs <- Gen.choose(0, 20)
      perDoc <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.choose(1L, 32L)).map(_.take(5)))
    } yield perDoc.zipWithIndex.flatMap { case (sizes, d) =>
      sizes.zipWithIndex.map { case (tok, c) => (d.toLong, c.toLong, tok) }
    }
    val u = Llm.md5Hex32Spark("concat('pack_', CAST(doc_id AS STRING))")
    val p = Prop.forAll(tableGen) { rows =>
      val ch = rows.toDF("doc_id", "chunk_id", "n_tok_chunk")
      val out = Curation.packFrom(ch).collect()
      val conserved = out.map(_.getLong(2)).sum == rows.map(_._3).sum &&
        out.map(_.getLong(1)).sum == rows.length
      val wG = Window.orderBy("u", "doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = ch.withColumn("u", expr(u))
        .withColumn("offset", coalesce(sum("n_tok_chunk").over(wG), lit(0L)))
        .groupBy(expr("offset DIV 128").as("seq_id"))
        .agg(count(lit(1)).as("n_chunks"), sum("n_tok_chunk").as("n_tokens"))
      val got = Curation.packFrom(ch).select("seq_id", "n_chunks", "n_tokens")
      conserved && got.except(ref).isEmpty && ref.except(got).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"pack property failed: ${res.status}")
  }

  test("incremental dedup: survivors disjoint from base, unique, and idempotent") {
    val docs = Tables(spark, sf, "documents")
    val out = Curation.incrementalFrom(docs)
    val baseForms = docs
      .withColumn("h", md5(Llm.normCol.cast("binary")))
      .withColumn("is_base", expr(
        s"pmod(${Llm.md5Hex32Spark("concat('inc_', CAST(doc_id AS STRING))")}, 2) = 0"))
      .filter(col("is_base")).select("h").distinct()
    assert(out.select("h").intersect(baseForms).isEmpty,
      "no surviving form may already exist in the base")
    assert(out.select("h").distinct().count() == out.count(),
      "one representative per surviving form")
    // ingesting the batch twice elects the same representatives
    val twice = Curation.incrementalFrom(docs.union(docs)).select("doc_id", "h")
    val once = out.select("doc_id", "h")
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty,
      "re-ingestion must not change the surviving set")
  }
}
