package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Iterative graph analytics over the star schema: PageRank power iteration
  * on the undirected customer–supplier purchase graph (an edge per distinct
  * (o_custkey, l_suppkey) pair in the order history). Quality/centrality
  * propagation over a relation graph is a standard corpus-curation signal
  * (authority-weighted sampling); the operator here is the canonical
  * distributed formulation: each iteration is one equi-join of the rank
  * frame onto the edge list plus one aggregation — no collects, no
  * adjacency materialization on the driver.
  *
  * Cross-engine determinism (the interesting part): a straight double sum
  * over neighbor contributions is shuffle-order-dependent. Every
  * contribution r(u)/deg(u) is therefore rounded to the shared 6-decimal
  * grid and summed as DECIMAL(38,6) — exact and associative, so Spark's
  * shuffle order and DuckDB's scan order cannot disagree — then the damping
  * arithmetic (one multiply, one add) and the final round-6 are identical
  * single IEEE ops on both engines. This quantized PageRank differs from
  * the fp-exact value by < 1e-6 per edge per round, and is BIT-identical
  * across engines (the same pattern as the money-sum DECIMAL convention).
  *
  * 100 TB shape: the edge list shuffles once to build degrees; each
  * iteration shuffles contribution rows by destination (map-side combined).
  * At cluster scale both sides bucket by node id so iterations reuse the
  * partitioning; the rank frame is |V| rows — orders of magnitude smaller
  * than the |E|-row edge list that dominates the join.
  */
object Graph {

  val Damping = 0.85

  /** Teleport numerator written as its own literal: Scala's `1.0 - 0.85`
    * is 0.15000000000000002 while DuckDB's DECIMAL `1.0 - 0.85` casts to
    * the double nearest 0.15 — one ulp apart, enough to flip a round-6
    * knife edge. Both engines parse the literal `0.15` to the identical
    * double. */
  val TeleportNum = 0.15
  val PrRounds = 3

  /** Undirected edge list, both directions, one row per (src, dst).
    * Node ids are PACKED LONGS — custkey*2 for customers, suppkey*2+1 for
    * suppliers (disjoint by parity) — not the user-facing 'c<custkey>' /
    * 's<suppkey>' strings: the edge list is the table every iteration
    * joins and the checkpoint materializes, and at 100x it is 120 M rows —
    * two ~8-byte longs per row shuffle, sort and hash ~3x smaller/faster
    * than two rendered strings. The string form exists only in
    * [[qPagerank]]'s final |V|-row projection (round 7; the 100x probe
    * showed the checkpoint materialization, not the exchanges, dominates
    * at scale). */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("cust"),
        (col("l_suppkey").cast("long") * 2 + 1).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** Render a packed node id back to the user-facing string id. */
  private def nodeLabel(id: Column): Column =
    when(id % 2 === 0, concat(lit("c"), (id / 2).cast("long")))
      .otherwise(concat(lit("s"), ((id - 1) / 2).cast("long")))

  /** Degree-annotated edge list, LAZY (pre-checkpoint): degree is folded in
    * by a window count over src — no self-join, so no per-branch join-key
    * null filters, and the union's two branches stay byte-identical plans
    * whose distinct-exchange is REUSED (PlanSpec asserts it). A
    * groupBy+self-join shape here computes the lineitem⋈orders source join
    * four times: each union branch gets a different isnotnull(concat(...))
    * pushed down, which defeats exchange reuse. */
  private[graft] def degAnnotatedEdges(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
    edges(spark, dir).withColumn("deg", count(lit(1)).over(bySrc))
  }

  /** PageRank after [[PrRounds]] quantized power iterations. The
    * degree-annotated edge list is eagerly checkpointed ONCE: every
    * iteration's plan references it, and without truncation each round
    * re-derives the lineitem-orders join (measured 7.5 s -> ~2 s at sf0.1).
    * Degree is folded in by a window count over src — one shuffle and a
    * SINGLE materialization, where the round-4 shape paid two back-to-back
    * eager checkpoints (edges, then edges⋈degrees). Same pattern as
    * [[Dedup.distributedClusters]]; ContextCleaner reclaims the blocks. */
  /** Previous invocation's checkpointed edge list, per (context, dir) —
    * reclaimed eagerly at the next call. Local-checkpoint blocks are not
    * evictable (truncated lineage), and Dataset's own localCheckpoint
    * offers no free() handle, so back-to-back invocations (the bench runs
    * every query 3+ times) stack whole edge lists in the block manager
    * until ContextCleaner catches up — the 100x probe's third pagerank run
    * died of execution-memory starvation exactly that way (round 7). Same
    * reclaim-on-entry pattern as StreamOps' scratch dirs: callers consume
    * the previous result before re-invoking. */
  private val liveCkpt = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]

  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // One job, ONE eager materialization (round 4 paid two back-to-back
    // checkpoints: edges, then edges⋈degrees).
    val ckptKey = s"${System.identityHashCode(spark.sparkContext)}|$dir"
    liveCkpt.remove(ckptKey).foreach(_.unpersist(blocking = true))
    // The checkpoint must carry a PLAIN hashpartitioning(src, P): AQE
    // would otherwise coalesce the window's exchange into a
    // CoalescedHashPartitioning, which no downstream exchange can be
    // asked to match (canCreatePartitioning = false) — every round's
    // |E|-row join side would re-shuffle. With coalescing off for this
    // one materialization, Bridge.localCheckpointed preserves the clean
    // partitioning + src ordering and the per-round joins (and the
    // nodes-distinct) consume the edge list in place, zero re-shuffles.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    val (eDeg, ckptRdd) =
      try {
        spark.conf.set(coalesceKey, "false")
        org.apache.spark.sql.graft.Bridge.localCheckpointed(degAnnotatedEdges(spark, dir))
      } finally spark.conf.set(coalesceKey, prevCoalesce)
    liveCkpt.put(ckptKey, ckptRdd)
    // every node has an edge (graph built from edges), so src covers V;
    // both jobs below read the checkpointed blocks, not the source join
    val nodes = eDeg.select("src").distinct()
    val n = nodes.count()
    val teleport = TeleportNum / n
    var ranks = nodes.select(col("src").as("node"), round(lit(1.0 / n), 6).as("rank"))
    for (_ <- 1 to PrRounds) {
      val contrib = eDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 6).cast(DecimalType(38, 6)).as("c"))
      ranks = contrib.groupBy(col("dst").as("node"))
        .agg(round(lit(teleport) + lit(Damping) * sum(col("c")).cast("double"), 6)
          .as("rank"))
    }
    // |V|-row final projection: packed ids -> user-facing string ids,
    // ordered as the oracle orders them (string sort)
    ranks.select(nodeLabel(col("node")).as("node"), col("rank"))
      .orderBy("node")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank
  )

  def oracleSql: Map[String, String] = {
    // every scalar is forced to DOUBLE: DuckDB evaluates bare `1.0 - 0.85`
    // in DECIMAL arithmetic, which would diverge from Spark's doubles
    val step = (i: Int) =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    round((SELECT tp FROM consts) + CAST($Damping AS DOUBLE) *
         |      CAST(SUM(CAST(round(r.rank / d.deg, 6) AS DECIMAL(38,6))) AS DOUBLE), 6) AS rank
         |  FROM e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    Map(
      "q_pagerank" ->
        s"""WITH p AS (
           |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
           |         's' || CAST(l_suppkey AS VARCHAR) AS supp
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT cust AS src, supp AS dst FROM p
           |      UNION ALL SELECT supp, cust FROM p),
           |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
           |consts AS (SELECT CAST($TeleportNum AS DOUBLE) / COUNT(*) AS tp,
           |                  COUNT(*) AS n FROM deg),
           |r0 AS (SELECT src AS node,
           |       round(CAST(1.0 AS DOUBLE) / (SELECT n FROM consts), 6) AS rank FROM deg),
           |${(1 to PrRounds).map(step).mkString(",\n")}
           |SELECT node, rank FROM r$PrRounds ORDER BY node""".stripMargin
    )
  }
}
