package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.1–§2.8: scans, filters, joins, aggregations, windows, sorts,
  * set ops, scalar function families. Every oracled query obeys the
  * determinism rules of SURVEY §2.0 (total order, rounded float aggs, no
  * raw timestamps, D4 events bridge, aligned column names).
  */
object Relational {

  // ---------------------------------------------------------------- §2.1
  private val qScanProject = Q(
    "q_scan_project",
    (s, dir) => {
      // Full scan + row-wise arithmetic projection. Pure per-row IEEE double
      // math (no re-association) is bit-identical across engines — no
      // rounding needed (SURVEY §2.1).
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"),
          col("l_discount"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("disc_price"))
        // (l_orderkey, l_linenumber) is NOT unique in this data — sort by
        // every output column so tied rows are identical (D1).
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
            l_extendedprice, l_discount,
            l_extendedprice * (1.0 - l_discount) AS disc_price
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount"""))

  // ---------------------------------------------------------------- §2.4
  private val qAggQ1 = Q(
    "q_agg_q1",
    (s, dir) => {
      // Flagship TPC-H Q1 variant (SURVEY §2.4). D2: every aggregated
      // double rounded to 4dp identically in the oracle.
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            ROUND(SUM(l_quantity), 4) AS sum_qty,
            ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
            ROUND(AVG(l_quantity), 4) AS avg_qty,
            ROUND(AVG(l_extendedprice), 4) AS avg_price,
            ROUND(AVG(l_discount), 4) AS avg_disc,
            CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  private val qAggCollect = Q(
    "q_agg_collect",
    (s, dir) => {
      // Nested-list output canary (SURVEY §2.4 / §7.3.5).
      Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list("l_partkey")).as("parts"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  // ---------------------------------------------------------------- §2.5
  private val qWinLagLead = Q(
    "q_win_lag_lead",
    (s, dir) => {
      // D4 canary: inter-event gap per user on the ns→µs bridged events.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
        .withColumn("prev_us", lag("ts_us", 1).over(w))
        .withColumn("gap_s", expr("(ts_us - prev_us) DIV 1000000"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .drop("prev_us")
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
            (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s,
            lead(event_type) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ORDER BY user_id, ts_us, event_id"""))

  val all: Seq[Q] = Seq(qScanProject, qAggQ1, qAggCollect, qWinLagLead)
}
