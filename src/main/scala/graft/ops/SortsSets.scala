package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.6 (sorts / limits / top-k) + §2.7 (set operations). */
object SortsSets {

  // ---------------------------------------------------------------- §2.6
  private val qTopk = Q(
    "q_topk",
    (s, dir) => {
      // orderBy().limit(k) → TakeOrderedAndProject physically: per-partition
      // heaps + driver merge, no global sort — the scalable top-k.
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""))

  private val qSortMultikey = Q(
    "q_sort_multikey",
    (s, dir) => {
      Tables(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .orderBy(
          col("c_mktsegment").asc_nulls_first,
          col("c_acctbal").desc_nulls_last,
          col("c_custkey"))
    },
    Some("""SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
            c_acctbal, c_mktsegment
            FROM customer
            ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST,
                     c_custkey"""))

  private val qTopkPerGroup = Q(
    "q_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- §2.7
  private def custSupp(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    val sup = Tables(s, dir, "supplier").filter(col("s_acctbal") > 9000.0)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"),
        col("s_acctbal").as("bal"))
    (c, sup)
  }

  private val qSetUnionAll = Q(
    "q_set_union_all",
    (s, dir) => {
      val (c, sup) = custSupp(s, dir)
      c.withColumn("src", lit("customer"))
        .unionAll(sup.withColumn("src", lit("supplier")))
        .orderBy("src", "key")
    },
    Some("""SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal,
                   'customer' AS src
            FROM customer WHERE c_acctbal > 9000.0
            UNION ALL
            SELECT s_suppkey, s_name, s_acctbal, 'supplier'
            FROM supplier WHERE s_acctbal > 9000.0
            ORDER BY src, key"""))

  private val qSetUnionDistinct = Q(
    "q_set_union_distinct",
    (s, dir) => {
      val (c, sup) = custSupp(s, dir)
      c.union(sup).distinct().orderBy("key", "name")
    },
    Some("""SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal
            FROM customer WHERE c_acctbal > 9000.0
            UNION
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier WHERE s_acctbal > 9000.0
            ORDER BY key, name"""))

  private val qSetIntersect = Q(
    "q_set_intersect",
    (s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"))
        .intersect(Tables(s, dir, "supplier")
          .select(col("s_nationkey").cast("long").as("nationkey")))
        .orderBy("nationkey")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS BIGINT) FROM supplier
            ORDER BY nationkey"""))

  private val qSetExcept = Q(
    "q_set_except",
    (s, dir) => {
      // Customers whose EVERY order is high-value: keys from the
      // high-value scan minus keys from the rest. The previous estimand
      // (customer nations EXCEPT supplier nations) was VACUOUSLY empty
      // at every sf — each nation has both — so the oracle pass proved
      // only schema agreement (VERDICT r10 #4); this split is non-empty
      // at all four rehearsal SFs (11 rows at sf0.01, 95 at sf0.1, 950
      // at sf1.0) so the pass proves EXCEPT semantics.
      Tables(s, dir, "orders").filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").cast("long").as("custkey"))
        .except(Tables(s, dir, "orders").filter(col("o_totalprice") <= 250000)
          .select(col("o_custkey").cast("long").as("custkey")))
        .orderBy("custkey")
    },
    Some("""SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders
            WHERE o_totalprice > 250000
            EXCEPT
            SELECT CAST(o_custkey AS BIGINT) FROM orders
            WHERE o_totalprice <= 250000
            ORDER BY custkey"""))

  /** Bag-semantics set ops (ALL variants): multiplicity-aware — a nation
    * key appearing 3× among customers and 1× among suppliers survives
    * EXCEPT ALL twice and INTERSECT ALL once. Physically a count-tagged
    * aggregation (no row-pair matching); same single-shuffle cost class as
    * the DISTINCT variants.
    */
  private val qSetExceptAll = Q(
    "q_set_except_all",
    (s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"))
        .exceptAll(Tables(s, dir, "supplier")
          .select(col("s_nationkey").cast("long").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    },
    Some("""SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
              EXCEPT ALL
              SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
            GROUP BY nationkey ORDER BY nationkey"""))

  private val qSetIntersectAll = Q(
    "q_set_intersect_all",
    (s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"))
        .intersectAll(Tables(s, dir, "supplier")
          .select(col("s_nationkey").cast("long").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    },
    Some("""SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
              INTERSECT ALL
              SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
            GROUP BY nationkey ORDER BY nationkey"""))

  val all: Seq[Q] = Seq(
    qTopk, qSortMultikey, qTopkPerGroup,
    qSetUnionAll, qSetUnionDistinct, qSetIntersect, qSetExcept,
    qSetExceptAll, qSetIntersectAll)
}
