package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (SURVEY §2.15):
  * fixed-iteration PageRank over the customer–supplier transaction graph.
  *
  * The engine-portability trick is INTEGER mass: ranks live in micro-units
  * (BIGINT), per-edge contributions are integer divisions, and the damping
  * factor is applied as (85 · m) DIV 100 — so every aggregation is a sum
  * of integers, which is exact and ORDER-INDEPENDENT. Float PageRank
  * cannot be oracled cell-exactly across engines (double sums drift with
  * partial-aggregation order); integer PageRank can, with rounding loss
  * (mass leakage to the floor) that is itself deterministic and identical
  * in both engines.
  */
object Graph {

  /** Lloyd-style fixed superstep count — like `q_vec_kmeans_refine` and
    * `q_text_bpe_iterate`, enough iterations to exercise the loop shape
    * (and let ranks separate from the uniform start) while keeping the
    * oracle a finite CTE chain.
    */
  private val PrIters = 3

  /** Initial rank per node, in micro-units (1.0 = 10⁶; 10⁹ keeps three
    * iterations of DIV-by-degree well above integer-floor noise).
    */
  private val PrInit = 1000000000L

  /** PageRank with damping 0.85 over the UNDIRECTED bipartite graph
    * customer —(ordered from)— supplier, distilled from orders ⋈ lineitem
    * (distinct pairs; both directions materialized, so every node has
    * out-degree ≥ 1 and there is no dangling mass). Nodes carry disjoint
    * integer ids (customer 2k, supplier 2k+1); output is the top-20 nodes
    * by final rank with the id split back into (node_type, node_key) —
    * all-integer (D1), fully deterministic tie-break.
    *
    * Scale shape: per superstep, contributions are one equi-join of the
    * skinny rank frame onto the degree-annotated edge list (both hash-
    * partitioned on src — a production run would co-bucket them once)
    * followed by one map-combinable integer sum keyed dst, then a
    * node-keyed LEFT join folds teleport back in. The rank frame is
    * re-materialized per superstep (localCheckpoint — the
    * ConnectedComponents pattern) so superstep t never replays 1..t−1;
    * the driver sees no data at all, only the loop counter. At 100 TB
    * this is textbook Pregel-on-shuffle: cost per iteration is one
    * shuffle of |E| skinny rows + one of |V|.
    */
  private val qGraphPagerank = Q(
    "q_graph_pagerank",
    (s, dir) => {
      val pairs = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = pairs.select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs.select((col("sk") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        .localCheckpoint(true)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // degree-annotated edges are loop-invariant: materialize once
      val edgesDeg = edges.join(deg, "src").localCheckpoint(true)
      val nodes = edges.select(col("src").as("id")).distinct().localCheckpoint(true)
      var ranks = nodes.select(col("id"), lit(PrInit).as("r")).localCheckpoint(true)
      for (_ <- 1 to PrIters) {
        val contrib = edgesDeg
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("r DIV deg").as("m"))
          .groupBy("id").agg(sum("m").as("m"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            expr(s"${PrInit * 15 / 100}L + (85 * coalesce(m, 0L)) DIV 100").as("r"))
          .localCheckpoint(true)
      }
      ranks
        .select(
          expr("CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END").as("node_type"),
          expr("id DIV 2").as("node_key"),
          col("r").as("rank_micro"))
        .orderBy(col("rank_micro").desc, col("node_type"), col("node_key"))
        .limit(20)
    },
    Some(s"""WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             edges AS (SELECT c * 2 AS src, sk * 2 + 1 AS dst FROM pairs
                       UNION ALL
                       SELECT sk * 2 + 1 AS src, c * 2 AS dst FROM pairs),
             deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                     FROM edges GROUP BY src),
             nodes AS (SELECT DISTINCT src AS id FROM edges),
             r0 AS (SELECT id, CAST($PrInit AS BIGINT) AS r FROM nodes),
             c1 AS (SELECT e.dst AS id, CAST(SUM(r0.r // d.deg) AS BIGINT) AS m
                    FROM edges e JOIN r0 ON e.src = r0.id JOIN deg d ON e.src = d.src
                    GROUP BY e.dst),
             r1 AS (SELECT n.id,
                     CAST(${PrInit * 15 / 100} + (85 * COALESCE(c1.m, 0)) // 100 AS BIGINT) AS r
                    FROM nodes n LEFT JOIN c1 ON n.id = c1.id),
             c2 AS (SELECT e.dst AS id, CAST(SUM(r1.r // d.deg) AS BIGINT) AS m
                    FROM edges e JOIN r1 ON e.src = r1.id JOIN deg d ON e.src = d.src
                    GROUP BY e.dst),
             r2 AS (SELECT n.id,
                     CAST(${PrInit * 15 / 100} + (85 * COALESCE(c2.m, 0)) // 100 AS BIGINT) AS r
                    FROM nodes n LEFT JOIN c2 ON n.id = c2.id),
             c3 AS (SELECT e.dst AS id, CAST(SUM(r2.r // d.deg) AS BIGINT) AS m
                    FROM edges e JOIN r2 ON e.src = r2.id JOIN deg d ON e.src = d.src
                    GROUP BY e.dst),
             r3 AS (SELECT n.id,
                     CAST(${PrInit * 15 / 100} + (85 * COALESCE(c3.m, 0)) // 100 AS BIGINT) AS r
                    FROM nodes n LEFT JOIN c3 ON n.id = c3.id)
             SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
                    id // 2 AS node_key, r AS rank_micro
             FROM r3
             ORDER BY rank_micro DESC, node_type, node_key LIMIT 20"""))

  val all: Seq[Q] = Seq(qGraphPagerank)
}
