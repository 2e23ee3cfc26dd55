package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.9 (reference-parity ETL, batch-expressible) + §2.10 batch-mode
  * streaming windows.
  *
  * These encode the reference's Kinesis→Firehose pipeline semantics
  * (decode → parse → route → batch → deliver/DLQ) as deterministic batch
  * queries; the live streaming versions (foreachBatch sink, watermarks,
  * stateful sessionization) live in graft.streaming and are exercised by
  * ScalaTest, not the t2 map.
  */
object Etl {

  /** The reference's routing rule: event field → Firehose delivery stream.
    * click/view → analytics; purchase/signup → transactions; error →
    * errors; anything else → default.
    */
  def routeCol: Column =
    when(col("event_type").isin("click", "view"), "analytics")
      .when(col("event_type").isin("purchase", "signup"), "transactions")
      .when(col("event_type") === "error", "errors")
      .otherwise("default")

  val routeSql: String =
    """CASE WHEN event_type IN ('click','view') THEN 'analytics'
            WHEN event_type IN ('purchase','signup') THEN 'transactions'
            WHEN event_type = 'error' THEN 'errors'
            ELSE 'default' END"""

  /** Firehose PutRecordBatch limit: ≤500 records per call. */
  val BatchSize = 500

  private val qEtlDecodeParse = Q(
    "q_etl_decode_parse",
    (s, dir) => {
      // Round-trips the payload through base64 exactly like the Kinesis
      // record `data` field, then parses the JSON (§0.1 steps 2+3).
      Tables.events(s, dir)
        .select(col("event_id"), base64(col("props").cast("binary")).as("b64"))
        .withColumn("decoded", unbase64(col("b64")).cast("string"))
        .withColumn("k_val", get_json_object(col("decoded"), "$.k").cast("long"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, to_base64(CAST(props AS BLOB)) AS b64,
            decode(from_base64(to_base64(CAST(props AS BLOB)))) AS decoded,
            CAST(decode(from_base64(to_base64(CAST(props AS BLOB))))->>'$.k' AS BIGINT) AS k_val
            FROM events ORDER BY event_id"""))

  private val qEtlRoute = Q(
    "q_etl_route",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("route", routeCol)
        .groupBy("route")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("route")
    },
    Some(s"""SELECT $routeSql AS route, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(value), 4) AS sum_value
             FROM events GROUP BY route ORDER BY route"""))

  private val qEtlBatchAssign = Q(
    "q_etl_batch_assign",
    (s, dir) => {
      // PutRecordBatch grouping (§0.1 step 5): per route, deterministic
      // arrival order (ts, event_id), batches of ≤500 records. Emits
      // per-batch record counts + payload bytes — n_records ≤ 500 proves
      // the invariant. Scale note: row_number per route is a single
      // shuffle; at 100 TB the batch id would be assigned per
      // micro-batch + shard (see graft.streaming.FirehoseSink).
      val w = Window.partitionBy("route").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .withColumn("route", routeCol)
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", expr(s"CAST((rn - 1) DIV $BatchSize AS BIGINT)"))
        .groupBy("route", "batch_id")
        .agg(
          count(lit(1)).as("n_records"),
          sum(length(col("props"))).cast("long").as("sum_bytes"))
        .orderBy("route", "batch_id")
    },
    Some(s"""WITH routed AS (
               SELECT $routeSql AS route, epoch_us(ts) AS ts_us, event_id, props
               FROM events),
             numbered AS (
               SELECT route, props,
                      (row_number() OVER (PARTITION BY route ORDER BY ts_us, event_id) - 1)
                        // $BatchSize AS batch_id
               FROM routed)
             SELECT route, CAST(batch_id AS BIGINT) AS batch_id,
                    CAST(COUNT(*) AS BIGINT) AS n_records,
                    CAST(SUM(length(props)) AS BIGINT) AS sum_bytes
             FROM numbered GROUP BY route, batch_id
             ORDER BY route, batch_id"""))

  private val qEtlDlq = Q(
    "q_etl_dlq",
    (s, dir) => {
      // Partial-failure split (§0.1 step 6): a deterministic poison
      // predicate stands in for per-record PutRecordBatch failures;
      // delivered ∪ dead ≡ input per route.
      val poison = col("value") < 10.0 || col("props").isNull ||
        expr("try_cast(get_json_object(props, '$.k') AS INT) IS NULL") ||
        expr("try_cast(get_json_object(props, '$.k') AS INT) % 10 = 0")
      Tables.events(s, dir)
        .withColumn("route", routeCol)
        .withColumn("is_dead", when(poison, 1L).otherwise(0L))
        .groupBy("route")
        .agg(
          sum("is_dead").as("n_dead"),
          sum(expr("1 - is_dead")).as("n_delivered"),
          count(lit(1)).as("n_total"))
        .orderBy("route")
    },
    Some(s"""SELECT $routeSql AS route,
             CAST(SUM(CASE WHEN value < 10.0 OR props IS NULL
                    OR TRY_CAST(props->>'$$.k' AS INT) IS NULL
                    OR TRY_CAST(props->>'$$.k' AS INT) % 10 = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
             CAST(SUM(CASE WHEN value < 10.0 OR props IS NULL
                    OR TRY_CAST(props->>'$$.k' AS INT) IS NULL
                    OR TRY_CAST(props->>'$$.k' AS INT) % 10 = 0
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_delivered,
             CAST(COUNT(*) AS BIGINT) AS n_total
             FROM events GROUP BY route ORDER BY route"""))

  // ------------------------------------------------------------- §2.10
  // Event-time windows, declared batch-mode (window()/session_window() are
  // batch-legal expressions); identical window() calls run under
  // readStream in graft.streaming. Window starts emitted as epoch seconds
  // (D3/D4); the oracle computes bucket boundaries arithmetically so no
  // engine-specific bucketing function is trusted.

  private val qStreamTumbling = Q(
    "q_stream_tumbling",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(
          col("window.start").cast("long").as("win_start_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start_s", "event_type")
    },
    Some("""SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start_s,
            event_type, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY win_start_s, event_type
            ORDER BY win_start_s, event_type"""))

  private val qStreamSliding = Q(
    "q_stream_sliding",
    (s, dir) => {
      // 1-hour window sliding 15 min: each event lands in 4 windows. The
      // oracle replicates each event against k=0..3 and reconstructs the
      // window start arithmetically.
      // avg via an exact integer-scaled sum + floor truncation: a raw
      // double avg differs between engines in the last ulp (summation
      // order), which flips ROUND at 4dp boundaries at larger SFs.
      Tables.events(s, dir)
        .withColumn("v_us", expr("CAST(round(value * 1000000) AS BIGINT)"))
        .groupBy(window(col("ts_ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("v_us").as("sv"))
        .select(
          col("window.start").cast("long").as("win_start_s"),
          col("event_type"), col("n"),
          // 1000000.0D: an undecorated 1000000.0 parses as DECIMAL in
          // Spark SQL (but DOUBLE in DuckDB) and the exact-decimal
          // division diverges from the oracle's double math by 1 ulp
          expr("floor(sv / (1000000.0D * n) * 10000) / 10000").as("avg_value"))
        .orderBy("win_start_s", "event_type")
    },
    Some("""WITH expanded AS (
              SELECT ((epoch_us(ts) // 1000000) // 900 - k) * 900 AS win_start_s,
                     event_type, CAST(round(value * 1000000) AS BIGINT) AS v_us
              FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) ks(k))
            SELECT win_start_s, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   floor(SUM(v_us) / (1000000.0 * COUNT(*)) * 10000) / 10000 AS avg_value
            FROM expanded GROUP BY win_start_s, event_type
            ORDER BY win_start_s, event_type"""))

  private val qStreamSession = Q(
    "q_stream_session",
    (s, dir) => {
      // Per-user sessions with 30-min inactivity gap. Spark merge rule: an
      // event at ts joins the session iff ts < last_event + gap, i.e. a new
      // session starts when (ts - prev) >= gap — the oracle's
      // gaps-and-islands formulation uses >= to match.
      Tables.events(s, dir)
        .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
        .select(
          col("user_id"),
          col("session_window.start").cast("long").as("session_start_s"),
          col("session_window.end").cast("long").as("session_end_s"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_s")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
            m AS (SELECT user_id, us, value,
                   CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
                        THEN 1 ELSE 0 END AS new_s
                  FROM e),
            i AS (SELECT user_id, us, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM m)
            SELECT user_id,
                   MIN(us) // 1000000 AS session_start_s,
                   (MAX(us) + 1800000000) // 1000000 AS session_end_s,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM i GROUP BY user_id, sid
            ORDER BY user_id, session_start_s"""))

  /** Reference-parity capstone (§0.1 steps 1–3 end to end): events are
    * packed into multi-record Lambda/Kinesis envelopes — the exact AWS
    * event shape, 100 records per envelope, payloads base64-wrapped —
    * then the library's `Pipeline.ingestEnvelopes` parses/explodes/
    * decodes them back. The oracle is simply the original events table:
    * the whole point of the hop is losslessness, so the round-trip must
    * reproduce it exactly.
    */
  private val qEtlEnvelope = Q(
    "q_etl_envelope",
    (s, dir) => {
      val recs = Tables.events(s, dir).select(
        expr("event_id DIV 100").as("env_id"),
        struct(
          concat(lit("shardId-0:"), col("event_id")).as("eventID"),
          struct(
            col("user_id").cast("string").as("partitionKey"),
            col("event_id").cast("string").as("sequenceNumber"),
            base64(to_json(struct(
              col("event_type").as("event_type"),
              get_json_object(col("props"), "$.k").cast("long").as("k")))
              .cast("binary")).as("data")).as("kinesis")).as("r"))
      val envelopes = recs.groupBy("env_id")
        .agg(to_json(struct(collect_list(col("r")).as("Records"))).as("envelope"))
      graft.streaming.Pipeline.ingestEnvelopes(envelopes, "envelope")
        .select(
          col("sequence_number").cast("long").as("event_id"),
          col("partition_key").cast("long").as("user_id"),
          get_json_object(col("payload"), "$.event_type").as("event_type"),
          get_json_object(col("payload"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
            CAST(props->>'$.k' AS BIGINT) AS k
            FROM events ORDER BY event_id"""))

  /** Small-file compaction planner — the lakehouse maintenance op a 100 TB
    * sink needs continuously: given records in deterministic arrival order,
    * assign each to an output file so files close at a byte budget
    * (greedy running-sum binning: file_id = floor(cumulative_bytes /
    * target); a record straddling the boundary stays in the earlier file,
    * so files can exceed the target by at most one record — the standard
    * contract). Differs from `q_etl_batch_assign` (fixed record COUNT per
    * batch) in binning by cumulative WEIGHT. One shuffle (the per-route
    * window); the running sum is integer arithmetic → exactly
    * reproducible.
    */
  private val qEtlCompact = Q(
    "q_etl_compact",
    (s, dir) => {
      val target = 4096L // bytes per output file
      val w = Window.partitionBy("route").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("route", routeCol)
        .withColumn("nbytes", length(col("props")).cast("long"))
        .withColumn("cum", sum(col("nbytes")).over(w))
        .withColumn("file_id", expr(s"CAST((cum - 1) DIV $target AS BIGINT)"))
        .groupBy("route", "file_id")
        .agg(
          count(lit(1)).as("n_records"),
          sum(col("nbytes")).cast("long").as("file_bytes"))
        .orderBy("route", "file_id")
    },
    Some(s"""WITH routed AS (
               SELECT $routeSql AS route, epoch_us(ts) AS ts_us, event_id,
                      CAST(length(props) AS BIGINT) AS nbytes
               FROM events),
             binned AS (
               SELECT route, nbytes,
                      (SUM(nbytes) OVER (PARTITION BY route ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                        // 4096 AS file_id
               FROM routed)
             SELECT route, CAST(file_id AS BIGINT) AS file_id,
                    CAST(COUNT(*) AS BIGINT) AS n_records,
                    CAST(SUM(nbytes) AS BIGINT) AS file_bytes
             FROM binned GROUP BY route, file_id
             ORDER BY route, file_id"""))

  val all: Seq[Q] = Seq(
    qEtlDecodeParse, qEtlRoute, qEtlBatchAssign, qEtlDlq, qEtlEnvelope,
    qEtlCompact, qStreamTumbling, qStreamSliding, qStreamSession)
}
