package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents` (SURVEY §2C / north star):
  * exact, MinHash+LSH banding, LSH-candidate Jaccard verification, SimHash.
  *
  * The near-dup pipeline is the classic 100 TB funnel:
  *
  *   shingle -> minhash signature -> LSH band bucketing -> candidate pairs
  *     -> exact Jaccard verify on candidates only
  *
  *  - Signatures are ONE row-local codegen walk per document (round 8,
  *    [[graft.functions.MinHashSigExpr]]): shingle, distinct, md5 halves,
  *    16 running mins — map-only, no (doc, shingle) shuffle at all. (The
  *    earlier explode + 16×min-agg form was correct but shuffled every
  *    shingle row; a HOF formulation was 20x slower still — HOFs are
  *    CodegenFallback and would md5 every shingle 16 times.)
  *  - LSH: 8 bands x 2 rows — P(candidate | jaccard=0.5) ~ 0.90,
  *    P(candidate | jaccard~0) ~ 0.1%. Banding turns near-dup search into an
  *    equi-join on (band_idx, band_hash) instead of an O(n^2) cross join.
  *  - Jaccard verify runs ONLY on LSH candidates (a few k pairs, not the
  *    O(n^2/sources) blocked cross join).
  *
  * Determinism vs the DuckDB oracle: the hash family is
  * h_i(s) = (v1(s) + i*v2(s)) mod 2^32 with v1/v2 = 32-bit ints parsed from
  * md5(s) hex — pure integer arithmetic, identical on both engines.
  */
object Dedup {

  private val MinhashFuncs = 16
  private val Bands = 8 // x2 rows per band
  private val Mod = 4294967296L // 2^32

  private def words(c: Column): Column = split(c, " ")

  /** Distinct word-3-gram shingles from a PRE-SPLIT words array column —
    * since round 8 a [[graft.functions.ShinglesExpr]] codegen walk. (The
    * previous HOF `array_distinct(transform(...))` form was interpreted
    * per element, and an inline split capture made it O(words²) per doc —
    * the walk closes both traps structurally.) */
  private def shinglesOf(w: Column): Column =
    graft.functions.ShinglesExpr.shinglesOf(w)

  /** Projects (doc_id, sh = shingles) via an explicit two-step select so
    * the split is evaluated once per row (see [[shinglesOf]]). */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), shinglesOf(col("ws")).as("sh"))

  /** Exact dedup: group identical texts, keep the smallest doc_id. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** MinHash signatures: sig_i = min over distinct shingles of
    * (v1 + i*v2) mod 2^32. Round 8: ONE row-local walk
    * ([[graft.functions.MinHashSigExpr]] — shingle, distinct, md5 halves,
    * 16 running mins, property-held equal to the explode + min-agg
    * formulation the DuckDB oracle still runs in MinHashSigSpec), so the
    * signature is map-only — the (doc, shingle) explode, the md5-hex
    * string round-trip, and the 16-column min-agg shuffle are gone. The
    * docs-frame parameter stays so the corpus funnel runs the LSH stage
    * on exact-dedup SURVIVORS (a group of k exact duplicates collides on
    * every band and would otherwise emit Bands*k²/2 candidate rows). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sigArr = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        graft.functions.MinHashSigExpr.minhashSigs(col("ws"), MinhashFuncs).as("sigs"))
    val cols = (0 until MinhashFuncs).map(i => col("sigs")(i).as(s"sig$i"))
    sigArr.select(col("doc_id") +: cols: _*)
  }

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    minhashSignatures(Tables.documents(spark, dir))

  /** (doc_id, band_idx, band_hash) — band hash = md5 of the band's sigs. */
  private def bandRows(docs: DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bandCols = (0 until Bands).map { b =>
      md5(concat_ws("|",
        (b * 2 until (b + 1) * 2).map(i => col(s"sig$i").cast("string")): _*)).as(s"band$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        posexplode(array((0 until Bands).map(b => col(s"band$b")): _*))
          .as(Seq("band_idx", "band_hash")))
  }

  /** MinHash + LSH banding over an arbitrary docs frame: candidate near-dup
    * pairs = docs sharing at least one band hash;
    * outputs (doc_a, doc_b, n_shared_bands). */
  private[graft] def lshCandidates(docs: DataFrame): DataFrame = {
    val bands = bandRows(docs)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshCandidates(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  /** Verified near-dups over an arbitrary docs frame: exact word-3-gram
    * Jaccard >= 0.5, computed only on the LSH candidate pairs (the
    * production funnel — never all pairs; the funnel cost is intentionally
    * NOT memoized so the benchmark measures the full candidate-generation +
    * verify pipeline). */
  private[graft] def verifiedNearDupPairs(docs: DataFrame): DataFrame = {
    val cand = lshCandidates(docs).select("doc_a", "doc_b")
    val sets = shingleSets(docs)
    val j = (size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb"))))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    verifiedNearDupPairs(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  /** Directional MinHash containment C(A→B) = |A∩B| / |A| over the SAME
    * LSH candidate funnel as [[qDedupJaccard]]. Containment catches
    * quote/subset duplication that symmetric Jaccard misses: a short doc
    * fully embedded in a long one has containment ≈ 1 but Jaccard ≈
    * |short|/|long| (the union is dominated by the long doc). Pairs where
    * either direction ≥ 0.5 survive. Same 100 TB shape as the Jaccard
    * verify: candidates only, never all pairs. */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cand = lshCandidates(docs).select("doc_a", "doc_b")
    val sets = shingleSets(docs)
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(inter / size(col("sa")), 6).as("containment_a"),
        round(inter / size(col("sb")), 6).as("containment_b"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash width and Hamming radius: 64-bit hash, 8 pigeonhole segments
    * of 8 bits each — Hamming distance <= 7 flips at most 7 segments, so at
    * least one segment is bit-identical. The 64-bit word hash is built from
    * TWO 32-bit md5 halves (hex chars 1-8 and 9-16) because a single
    * unsigned-64 hex parse overflows a signed BIGINT on both engines. */
  private val SimhashBits = 64
  private val SimhashMaxHamming = 7

  /** Hamming-pigeonhole segments (bitOffset, bitLen) of the 64-bit simhash:
    * 8 segments x 8 bits. Candidate pairs are an EQUI-JOIN on
    * (source, segment_idx, segment_bits), never an all-pairs block join.
    * Capacity math: each (source, segment) key space is 2^8 = 256 values
    * (vs 2^3..2^4 = 8-16 for the old 16-bit hash), so within-source
    * candidates are O(8 * m^2 / 256) worst case — and on real content the
    * 8 matched bits correlate with actual similarity, so occupied buckets
    * are far smaller than m/256. Fewer, wider segments (e.g. 4 x 16 at
    * radius 3) trade radius for capacity; this layout keeps a useful
    * radius-7 near-dup semantic while lifting the join-key cardinality
    * bound 16x. */
  private val SimhashSegments: Seq[(Int, Int)] =
    (0 until 8).map(s => (s * 8, 8))

  /** SimHash64 per doc + near-dup pairs at Hamming distance <= 7 within the
    * same source block. Candidate generation is banded (same shape as the
    * MinHash band join above): each doc emits one row per simhash segment,
    * pairs sharing any (source, segment) equi-join, duplicates from
    * multi-segment matches collapse with a distinct, and the Hamming
    * verify runs on candidates only — within-source cost is O(matches),
    * not O(m²) per source block.
    *
    * The signature itself is ONE row-local byte walk
    * ([[graft.functions.SimHash64Expr]], round 8): the declarative
    * formulation exploded every word through md5-hex string arithmetic and
    * shuffled every (doc, word) row into a 64-column vote aggregation; the
    * expression keeps the whole per-doc reduction map-only with identical
    * bit semantics (empties-kept split, md5-half votes, strict-majority
    * bits — pinned against the declarative twin in SimHash64Spec). */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val sim = d.select(col("doc_id"), col("source"),
      graft.functions.SimHash64Expr.simhash64(col("text")).as("simhash"))
    val segCols = SimhashSegments.map { case (off, len) =>
      // arithmetic shift sign-extends for the top segment; the AND masks it
      shiftright(col("simhash"), off).bitwiseAND(lit((1L << len) - 1))
    }
    val segRows = sim.select(col("doc_id"), col("source"), col("simhash"),
      posexplode(array(segCols: _*)).as(Seq("seg_idx", "seg_bits")))
    val a = segRows.as("a")
    val b = segRows.as("b")
    a.join(b, col("a.source") === col("b.source") &&
        col("a.seg_idx") === col("b.seg_idx") && col("a.seg_bits") === col("b.seg_bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Near-duplicate CLUSTERS: connected components over the verified
    * Jaccard pair graph, labeled by the component's minimum doc_id — the
    * step an actual dedup job needs (keep ONE doc per cluster, not per
    * pair). Distributed min-label propagation: each iteration joins the
    * current labels across the undirected edge set and keeps the row-wise
    * minimum; iterate to fixpoint (O(component diameter) rounds — the
    * pair graph is the tiny LSH-funnel output, a few orders smaller than
    * the corpus, so each round is a small-join job even at 100 TB; the
    * only driver value per round is the changed-row count). */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir, smallCollect = 1000000L)

  /** See [[qDedupClusters]] scaladoc above. `smallCollect`: pair graphs at
    * or under this edge count are solved with driver-side union-find (the
    * same small-input fast path as the selection quantiles — a handful of
    * per-round Spark jobs costs more than sorting dust); larger graphs run
    * the distributed min-label propagation loop. */
  private[operators] def dedupClusters(spark: SparkSession, dir: String,
                                       smallCollect: Long): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // materialize the funnel ONCE before self-unioning: both union branches
    // reference the same plan, so an unpersisted union would run the whole
    // LSH+Jaccard funnel twice on first materialization
    val pairs = qDedupJaccard(spark, dir).select("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val npairs = pairs.count()
    if (npairs <= smallCollect) {
      // driver union-find with path compression; label = component min
      import spark.implicits._
      val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist(blocking = false)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val label = parent.keys.map(d => d -> find(d)).toMap
        .groupBy(_._2).values.flatMap { members =>
          val minDoc = members.keys.min
          members.keys.map(_ -> (minDoc, members.size.toLong))
        }.toMap
      label.toSeq.map { case (d, (cid, sz)) => (d, cid, sz) }
        .sortBy(_._1)
        .toDF("doc_id", "cluster_id", "cluster_size")
    } else distributedClusters(spark, pairs, npairs)
  }

  /** Pair graphs at or under this edge count get explicit `broadcast()`
    * hints on the per-round label frames (they are at most `2 * npairs`
    * rows); larger graphs drop the hints and let AQE pick the join
    * strategy from runtime sizes — a driver-scale pair graph must never be
    * forced through a driver broadcast. */
  private val BroadcastPairLimit = 5000000L

  /** Distributed path: min-label propagation WITH pointer doubling to
    * fixpoint over the (cached) pair frame. Each round takes the min over
    * direct neighbors' labels, then follows the resulting label one more
    * hop (label-of-label) — labels reach the component minimum in
    * O(log diameter) rounds instead of O(diameter), the standard
    * large-graph connected-components acceleration. */
  private[operators] def distributedClusters(spark: SparkSession,
                                             pairs: DataFrame,
                                             npairs: Long = -1L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // hint only when the caller-counted edge count proves the label frames
    // are small; unknown (-1) or large graphs rely on AQE
    val hinted = npairs >= 0L && npairs <= BroadcastPairLimit
    def maybeBroadcast(df: DataFrame): DataFrame = if (hinted) broadcast(df) else df
    val und = pairs.unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every round ends in an EAGER localCheckpoint: the data is cached and
    // the logical plan is truncated — without it the doubling join (which
    // references the round's frame twice) doubles the lineage every round
    // and the plan blows up exponentially. Round 7: checkpoints go through
    // Bridge.localCheckpointed so each round's blocks are unpersisted
    // DETERMINISTICALLY once the next round is materialized (the eager
    // checkpoint truncates the dependency) — waiting on GC + the async
    // ContextCleaner let up to O(rounds) |V|-row block sets stack up,
    // the same accumulation class that OOM'd pagerank's 100x probe.
    val ckpt = (df: org.apache.spark.sql.DataFrame) =>
      org.apache.spark.sql.graft.Bridge.localCheckpointed(df)
    var (labels, labelsHandle) = ckpt(
      und.select(col("doc_a").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id")))
    try {
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 50) {
        val neighborMin = und
          .join(maybeBroadcast(labels.withColumnRenamed("doc_id", "doc_b")), Seq("doc_b"))
          .groupBy(col("doc_a").as("doc_id"))
          .agg(min(col("cluster_id")).as("nbr_min"))
        val prop = labels.join(maybeBroadcast(neighborMin), Seq("doc_id"), "left")
          .select(col("doc_id"), col("cluster_id").as("old_cid"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("mid_cid"))
        // pointer doubling: follow the new label one more hop (the label of
        // a doc is itself a doc in the same component)
        val hop = prop.select(col("doc_id").as("mid_cid"), col("mid_cid").as("hop_cid"))
        val (next, nextHandle) = ckpt(
          prop.join(maybeBroadcast(hop), Seq("mid_cid"), "left")
            .select(col("doc_id"),
              least(col("mid_cid"), coalesce(col("hop_cid"), col("mid_cid"))).as("cluster_id"),
              col("old_cid"))
            .withColumn("moved", col("cluster_id") < col("old_cid"))
            .drop("old_cid"))
        changed = next.filter(col("moved")).count()
        labels = next.drop("moved")
        labelsHandle.unpersist(blocking = false)
        labelsHandle = nextHandle
        rounds += 1
      }
      // a pathological pair graph must fail loudly, never return
      // partially-propagated labels as if they were clusters
      require(changed == 0,
        s"label propagation did not converge in $rounds rounds ($changed labels still moving)")
      // the RESULT checkpoint intentionally keeps Dataset.localCheckpoint:
      // it outlives this call (the caller consumes the returned frame), so
      // GC + ContextCleaner remain the right owners for its blocks
      labels
        .join(labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size")), "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally {
      pairs.unpersist(blocking = false)
      und.unpersist(blocking = false)
      labelsHandle.unpersist(blocking = false)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash_lsh" -> qDedupMinhashLsh,
    "q_dedup_jaccard" -> qDedupJaccard,
    "q_dedup_containment" -> qDedupContainment,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_clusters" -> qDedupClusters
  )

  // ---------------------------------------------------------------- oracles

  private val shinglesSql =
    "list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1), i -> array_to_string(ws[i:i+2], '|')))"

  /** Exact integer hex parse of md5 substring [start, start+7] (1-based). */
  private def hex32Sql(start: Int): String =
    (0 until 8).map { k =>
      val mult = 1L << (4 * (7 - k))
      s"(strpos('0123456789abcdef', m[${start + k}]) - 1) * $mult"
    }.mkString("(", " + ", ")")

  /** Shared CTE prefix: shingles -> hashes -> signatures -> band rows. */
  private def lshCtes: String = {
    val sigAggs = (0 until MinhashFuncs)
      .map(i => s"MIN((v1 + $i * v2) % $Mod) AS sig$i")
      .mkString(", ")
    val bandsSql = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, md5(${(b * 2 until (b + 1) * 2).map(i => s"sig$i::VARCHAR").mkString(" || '|' || ")}) AS band_hash FROM sigs")
      .mkString(" UNION ALL ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM w),
       |hs AS (SELECT doc_id, md5(s) AS m FROM sh),
       |hv AS (SELECT doc_id, ${hex32Sql(1)} AS v1, ${hex32Sql(9)} AS v2 FROM hs),
       |sigs AS (SELECT doc_id, $sigAggs FROM hv GROUP BY doc_id),
       |bands AS ($bandsSql),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared_bands
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** LSH funnel + Jaccard-verified pair CTEs, shared with the corpus-funnel
    * oracle (`graft.CorpusPipeline`): ends with `jj(doc_a, doc_b, jaccard)`
    * over the LSH candidates. */
  private[graft] def jaccardCtes: String =
    s"""$lshCtes,
       |sets AS (SELECT doc_id, $shinglesSql AS sh FROM w),
       |jj AS (
       |  SELECT c.doc_a, c.doc_b,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |          len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
       |  FROM cand c JOIN sets a ON c.doc_a = a.doc_id JOIN sets b ON c.doc_b = b.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = {
    // 64-bit simhash from two 32-bit md5 halves (h_hi = hex chars 1-8,
    // h_lo = chars 9-16): bit b < 32 reads h_lo, b >= 32 reads h_hi.
    // The signed-64 value sums per-bit terms in ascending order with the
    // bit-63 term = BIGINT min — partial sums peak at 2^63-1, no overflow.
    val votes = (0 until SimhashBits).map { bit =>
      val src = if (bit < 32) "h_lo" else "h_hi"
      s"SUM((($src // ${1L << (bit % 32)}) % 2) * 2 - 1) AS v$bit"
    }.mkString(", ")
    val simhashExpr = (0 until SimhashBits).map { bit =>
      val term = if (bit == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << bit} AS BIGINT)"
      s"CASE WHEN v$bit > 0 THEN $term ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    Map(
      "q_dedup_exact" ->
        """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
          |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
      "q_dedup_minhash_lsh" ->
        s"""WITH $lshCtes
           |SELECT doc_a, doc_b, n_shared_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,
      "q_dedup_jaccard" ->
        s"""WITH $jaccardCtes
           |SELECT doc_a, doc_b, jaccard FROM jj WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
      "q_dedup_containment" ->
        s"""WITH $lshCtes,
           |sets AS (SELECT doc_id, $shinglesSql AS sh FROM w),
           |ct AS (
           |  SELECT c.doc_a, c.doc_b,
           |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS containment_a,
           |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6) AS containment_b
           |  FROM cand c JOIN sets a ON c.doc_a = a.doc_id JOIN sets b ON c.doc_b = b.doc_id)
           |SELECT doc_a, doc_b, containment_a, containment_b FROM ct
           |WHERE greatest(containment_a, containment_b) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
      "q_dedup_clusters" ->
        s"""WITH RECURSIVE $jaccardCtes,
           |p AS (SELECT doc_a, doc_b FROM jj WHERE jaccard >= 0.5),
           |und AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
           |reach(a, b) AS (
           |  SELECT a, b FROM und
           |  UNION
           |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
           |lbl AS (
           |  SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
           |  FROM reach GROUP BY a)
           |SELECT l.doc_id, l.cluster_id,
           |  CAST(COUNT(*) OVER (PARTITION BY l.cluster_id) AS BIGINT) AS cluster_size
           |FROM lbl l ORDER BY doc_id""".stripMargin,
      "q_dedup_simhash" ->
        s"""WITH e AS (
           |  SELECT doc_id, source, md5(unnest(string_split(text, ' '))) AS m FROM documents),
           |h AS (SELECT doc_id, source, ${hex32Sql(1)} AS h_hi, ${hex32Sql(9)} AS h_lo FROM e),
           |v AS (SELECT doc_id, source, $votes FROM h GROUP BY doc_id, source),
           |s AS (SELECT doc_id, source, CAST($simhashExpr AS BIGINT) AS simhash FROM v)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
           |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming
           |ORDER BY doc_a, doc_b""".stripMargin
    )
  }
}
