package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 (scan pruning) + §2.2 (filters/predicates). */
object Filters {

  private val qScanPruned = Q(
    "q_scan_pruned",
    (s, dir) => {
      // Projection pushdown: 2 of 11 lineitem columns reach the parquet
      // scan (Catalyst ColumnPruning); verified via explain: ReadSchema
      // carries only these fields.
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  private val qFilterCompound = Q(
    "q_filter_compound",
    (s, dir) => {
      // AND/OR/NOT, BETWEEN on dates, IN list, LIKE prefix+infix, IS NULL
      // guard. All predicates are parquet-pushdown-friendly conjuncts where
      // possible (Catalyst splits the top-level AND).
      Tables(s, dir, "orders")
        .filter(
          col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp"))
            && col("o_orderstatus").isin("F", "P")
            && (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("%HIGH%"))
            && !(col("o_totalprice") < 10000.0)
            && col("o_custkey").isNotNull)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
              AND o_orderstatus IN ('F','P')
              AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%HIGH%')
              AND NOT (o_totalprice < 10000.0)
              AND o_custkey IS NOT NULL
            ORDER BY o_orderkey"""))

  private val qFilterJson = Q(
    "q_filter_json",
    (s, dir) => {
      // Schema-on-read filter over the JSON payload column (the reference's
      // routing-field inspection, §0.1 step 4).
      Tables.events(s, dir)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k_val") > 50 && col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("k_val"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
            CAST(props->>'$.k' AS BIGINT) AS k_val
            FROM events
            WHERE CAST(props->>'$.k' AS BIGINT) > 50
              AND event_type IN ('purchase','signup')
            ORDER BY event_id"""))

  val all: Seq[Q] = Seq(qScanPruned, qFilterCompound, qFilterJson)
}
