package graft.ops

import graft.SparkSpec

/** Randomized equivalence check of the alternating star-contraction CC
  * against an in-memory union-find reference (fixed seed — each trial
  * runs real Spark jobs, so a bounded deterministic battery stands in
  * for full ScalaCheck here; the 500-node-path and clique topologies
  * are pinned separately in InvariantsSpec).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Min-label per component over the nodes that appear in a non-self
    * edge — the same domain ConnectedComponents.labels covers.
    */
  private def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val real = edges.filter(e => e._1 != e._2)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    real.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.valuesIterator.flatMap { ns =>
      val m = ns.min
      ns.map(_ -> m)
    }.toMap
  }

  test("random graphs: star-contraction labels equal the union-find reference") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 20 + rnd.nextInt(60)
      val edges = Seq.fill(rnd.nextInt(2 * n) + 1)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = unionFindLabels(edges)
      if (want.nonEmpty) {
        val (lbl, rounds) = ConnectedComponents.labels(edges.toDF("a", "b"))
        val got = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want,
          s"trial $trial (n=$n, ${edges.length} edges, $rounds rounds): " +
            s"diff=${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
      }
    }
  }

  test("self-loop-only input yields no labels; empty input converges immediately") {
    val (lbl1, _) = ConnectedComponents.labels(Seq((5L, 5L)).toDF("a", "b"))
    assert(lbl1.isEmpty)
    val (lbl2, r2) = ConnectedComponents.labels(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(lbl2.isEmpty && r2 == 0)
  }
}
