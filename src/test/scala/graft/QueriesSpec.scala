package graft

/** Smoke + determinism over the whole declared inventory (SURVEY §5.2):
  * every t2 query must build a plan, execute on sf0.001, and produce the
  * same rows when run twice (catches nondeterministic ordering — D1 — at
  * build time rather than at the driver's hash compare).
  */
class QueriesSpec extends SparkSpec {

  // Queries legitimately empty at sf0.001 (tiny data): anti-join and
  // except can be empty, and the theta-range price band matches no pair
  // in a 40-row part table; everything else must return rows.
  private val mayBeEmpty = Set("q_join_left_anti", "q_set_except", "q_join_theta_range")

  SparkEntry.declared.foreach { q =>
    test(s"${q.name} executes and is deterministic") {
      val r1 = q.fn(spark, sf).collect()
      if (!mayBeEmpty(q.name)) assert(r1.nonEmpty, s"${q.name} returned 0 rows")
      val r2 = q.fn(spark, sf).collect()
      assert(r1.toSeq == r2.toSeq, s"${q.name} not deterministic across runs")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries and no duplicate names") {
    val names = SparkEntry.declared.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle SQL is single-line (driver JSON safety)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("\n") && !sql.contains("\r"), s"$k oracle has newline")
    }
  }
}
