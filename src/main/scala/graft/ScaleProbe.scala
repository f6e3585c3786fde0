package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10x scale probe, now covering the FULL contract surface: the
  * sf0.1 bench cannot see the quadratic candidate-blowup terms the
  * dedup/ANN family is DESIGNED to avoid (round-5 verdict task 6), nor a
  * relational plan that silently degrades when fact AND dimension tables
  * grow together (broadcast thresholds, window partition widths), so this
  * tool derives a 10x corpus from sf0.1 and times every contract query at
  * both scales.
  *
  * Derivation keeps the similarity structure realistic instead of creating
  * degenerate duplicate clusters:
  *  - documents: replica r > 0 SUFFIXES every word with a replica token, so
  *    word-n-gram shingles keep exactly the original corpus's structure —
  *    within-replica similarity (and thus the LSH candidate rate) mirrors
  *    the original corpus, cross-replica Jaccard is 0, and the DUPLICATE
  *    RATE (what candidate counts scale with) stays the original corpus's
  *    rather than multiplying. (A first cut interleaved the token BETWEEN
  *    words; that turns half the 3-gram shingles into token|word|token ≈
  *    unigrams, inflates cross-doc Jaccard within a replica, and blows the
  *    candidate set up quadratically — a derivation artifact, not an
  *    engine property.)
  *  - embeddings: replica r > 0 applies a deterministic per-replica SIGN
  *    FLIP pattern (dim i negated iff murmur3(r, i) is odd) — the
  *    embedding analog of the documents word-suffixing. A ±1 diagonal is
  *    an ORTHOGONAL transform: within a replica every pairwise cosine is
  *    preserved EXACTLY ((Dx)·(Dy) = x·y, norms unchanged), so the
  *    near-dup structure and the per-replica LSH candidate rate mirror
  *    the original corpus; across replicas the patterns differ in ~half
  *    of 64 dims, so cross-replica cosines concentrate near 0 (~1/√64
  *    std) and replicas do NOT form near-dup cliques. This replaced the
  *    round-5..13 derivation (per-dim jitter plus a −0.03·r uniform
  *    shift): at r ≈ 100 the shift term dominated every coordinate, all
  *    high-r vectors collapsed toward the −1⃗ direction (mutual cosine
  *    ≈ 1, one giant LSH bucket), and q_dedup_embedding's CORRECT output
  *    became ~300 M derivation-artifact pairs — which is why its 100×
  *    row was the table's one "—" (round-13 verdict item 3). Under sign
  *    flips output and candidates scale Θ(N) and the row is measurable.
  *
  * Both scales are materialized as 32-file parquet (the 1x side is a plain
  * repartitioned copy of src): the sf0.1 fixtures are single part-files,
  * which read back as ONE input partition — timing 1-core-vs-32-core would
  * corrupt the ratio, and no real corpus at either scale is a single file.
  *
  * Usage: ScaleProbe [srcDir] [probeDir] — generates probeDir/x1 and
  * probeDir/x10 on first run, then times each family query at both scales
  * (2 passes, min) and prints one JSON line per query plus the ratio table
  * for SURVEY.
  */
object ScaleProbe {

  /** Replica factor for the derived corpus. 10 by default; the round-6
    * verdict's 100x probe of the heaviest queries sets
    * SPARK_GRAFT_PROBE_REPLICAS=100 with its own probe dir — broadcast→
    * shuffle flips and AQE decisions move at the next decade, and the 10x
    * ratios cannot see them. */
  private val Replicas: Int = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPLICAS", "10")
    val n = raw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_PROBE_REPLICAS must be a positive integer, got '$raw'"))
    require(n > 0, s"SPARK_GRAFT_PROBE_REPLICAS must be positive, got $n")
    n
  }

  /** Directory label / JSON key suffix for the scaled side. */
  private val XN = s"x$Replicas"

  private val Family = Seq(
    // dedup / ANN — the family the probe was built for
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_dedup_jaccard", "q_dedup_containment", "q_dedup_clusters",
    "q_corpus_funnel", "q_ann_lsh_buckets", "q_ann_lsh_probe",
    "q_ann_ivf", "q_ann_pq", "q_emb_hamming", "q_dedup_embedding",
    "q_cosine_topk",
    // text / quality / training-prep — every other documents-only
    // contract query, so the whole LLM-pipeline surface has measured
    // 10x ratios
    "q_text_stats", "q_text_normalize", "q_ngram_lm", "q_lang_id", "q_quality_score",
    "q_char_entropy", "q_token_count_regex", "q_tfidf",
    "q_doc_fingerprint", "q_doc_chunks", "q_rep_ngram_filters",
    "q_segment_dedup", "q_vocab_coverage", "q_pii_scrub",
    "q_decontaminate", "q_decontaminate_bloom", "q_bpe_train",
    "q_sample_reservoir", "q_mixture_sample", "q_pack_sequences",
    "q_truncate_budget", "q_shard_assign", "q_interleave_order",
    "q_multimodal_features", "q_frame_sample", "q_media_resize",
    // events — the time-series/window surface, incl. the three former
    // low-cardinality-window queries rewritten onto composite keys in
    // round 5 (q_rolling_quantile here; reservoir/pack above). Replicas
    // suffix user_id/event_id so per-user session structure and the
    // duplicate rate are preserved and scaling is honestly linear.
    "q_events_hourly", "q_events_sliding", "q_event_gaps", "q_gap_fill",
    "q_events_json", "q_sessionize", "q_session_window",
    "q_rolling_quantile", "q_stream_dedup_batch",
    // round-6 additions (missing from the probe until round 7):
    // semi-structured inference over events.props, and the live
    // Structured Streaming dedup (file stream + state store + scratch
    // sink — its ratio includes the fixed streaming-harness overhead)
    "q_schema_infer_json", "q_stream_dedup_live",
    // round-8 additions: the live watermarked session-window drain and
    // the live bounded-ring rolling quantiles
    "q_session_window_live", "q_rolling_quantile_live")

  /** The relational/tokenize remainder of the contract surface (probed
    * late round 5): every query reading the TPC-H-ish tables, plus the
    * documents/embeddings queries the first family list missed. The TPC-H
    * derivation shifts ALL foreign keys by the same k*10+r formula on both
    * fact and dimension sides, so join fan-out and selectivity are
    * preserved while dimensions grow 10x WITH the facts — at 10x a
    * formerly-broadcast dimension may legitimately cross the broadcast
    * threshold, which is exactly the plan transition the probe should
    * exercise (AQE decides at runtime). nation/region stay verbatim: real
    * enum-like dims do not grow with the corpus. */
  private val RelFamily = Seq(
    "q1_pricing_summary", "q_filter_project", "q_case_math",
    "q_string_funcs", "q_date_funcs", "q_array_funcs",
    "q_having", "q_distinct_agg", "q_stats_agg", "q_conditional_agg",
    "q_collect_list", "q_mode_agg", "q_argmax", "q_typed_agg",
    "q_group_median", "q_percentile_disc", "q_approx_sketches",
    "q_sketch_gate_exact",
    "q_grouping_sets", "q_rollup", "q_cube", "q_pivot", "q_unpivot",
    "q_join_star", "q_semi_join", "q_anti_join", "q_outer_join",
    "q_cross_join", "q_lateral_join", "q_asof_join", "q_range_join",
    "q_skew_join", "q_exists_subquery", "q_scalar_subquery",
    "q_set_ops", "q_topk_orders", "q_sample_hash", "q_sample_stratified",
    "q_sample_weighted",
    "q_window_rank", "q_window_nav", "q_window_running",
    "q_window_range_frame", "q_window_dist",
    "q_tokenize_rank", "q_tokenize_bucketize", "q_tokenize_rightopen",
    "q_tokenize_qcut", "q_token_histogram", "q_tokenize_nan",
    "q_quantile_bounds", "q_quantile_bounds_sample",
    "q_schema_infer", "q_zorder_cluster", "q_pagerank",
    "q_word_freq", "q_lang_breakdown", "q_bpe_pairs", "q_fuzzy_pairs",
    "q_fuzzy_best",
    "q_ann_recall", "q_kmeans_step",
    // round-8 additions: derived physical layouts (bucketed join /
    // partitioned pruning) — the first probe invocation per dir pays the
    // layout build, min-of-passes times the steady-state query, the same
    // amortization convention as the other model-state queries
    "q_bucketed_join", "q_partition_prune", "q_merge_upsert")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probe = if (args.length > 1) args(1) else "/root/repo/tmp/sfprobe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // optional extra args: probe only these queries (dev loop / family split)
    val only: Set[String] = args.drop(2).toSet
    val family = (Family ++ RelFamily).filter(n => only.isEmpty || only(n))
    // lineitem is written LAST overall — the generation sentinel; a probe
    // dir from before the TPC-H extension regenerates in full.
    if (!new java.io.File(s"$probe/$XN/lineitem.parquet").exists()) generate(spark, src, probe)
    // Untimed page-cache warm (round-12 verdict item 6): pass 1 of a cold
    // window burned 60–96 s per heavy query on first-touch reads of the
    // corpus — min-of-passes absorbed it, but it cost ~half the probe's
    // wall and made pass-1 numbers meaningless. One sequential read of
    // both corpus dirs before timing starts.
    Seq(s"$probe/x1", s"$probe/$XN").foreach(warmDir)

    // A query may legitimately refuse a scale (e.g. q_quantile_bounds_sample
    // `require`s n <= 1M — its hash-oracle regime — and x10 lineitem is 6M):
    // record the failure per (query, scale) instead of letting one throw
    // abort the whole multi-hour probe run.
    val failed = scala.collection.mutable.Map.empty[(String, String), String]
    def timeOnce(name: String, dir: String): Option[Double] =
      try {
        // Pay the GC debt UNTIMED before each sample (round 14, measured):
        // the session's 60 s periodic-GC tick phase-locks with a ~60 s
        // deterministic multi-query pass and lands a full 32 g-heap
        // System.gc() in the SAME query's slot on every pass — q_ann_recall
        // read a constant 7.0 s across passes vs 0.94 s in the identical
        // window with the tick moved (SPARK_GRAFT_PERIODIC_GC=100000s
        // A/B). Collecting the prior samples' garbage here makes any tick
        // that does land inside a timed region near-free, without
        // disabling the cleaner semantics long probes rely on. A tick can
        // still land inside a single > 60 s sample — disclosed, and
        // min-of-N absorbs it since the phase drifts per pass.
        System.gc()
        val s0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - s0) / 1e9)
      } catch {
        case e: Throwable =>
          failed((name, if (dir.endsWith(XN)) XN else "x1")) =
            s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)
          None
      }
    // ROUND-ROBIN passes with min per (query, scale), same rationale as
    // Bench: this host's hypervisor-steal windows outlast back-to-back
    // samples (measured here: the same query 3.5 s in one pass, 83 s in
    // the next), so a query's samples must be minutes apart.
    val scales = Seq("x1" -> s"$probe/x1", XN -> s"$probe/$XN")
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (p <- 1 to 3) {
      for (name <- family; (scale, dir) <- scales; k = (name, scale)
           if !failed.contains(k)) {
        val h0 = HostMeter.sample()
        timeOnce(name, dir) match {
          case Some(t) =>
            // per-pass host-contention telemetry (round-13 verdict item 4):
            // SURVEY rows cite their window's measured loadavg/steal
            // instead of asserting "clean"
            val host = HostMeter.describe(h0, HostMeter.sample())
            System.err.println(f"[probe] pass=$p $scale%-3s $name%-22s $t%7.2fs  $host")
            if (t < best.getOrElse(k, Double.MaxValue)) best(k) = t
          case None =>
            System.err.println(s"[probe] FAIL pass=$p $scale $name ${failed(k)}")
        }
      }
      System.gc() // untimed: reap the pass's broadcast/shuffle blocks
    }
    val rows = family.flatMap { name =>
      (best.get((name, "x1")), best.get((name, XN))) match {
        case (Some(base), Some(big)) =>
          val ratio = big / base
          System.err.println(f"[probe] min $name%-22s base=$base%7.2fs $XN%s=$big%7.2fs ratio=$ratio%6.1f")
          Some((name, base, big, ratio))
        case _ =>
          System.err.println(s"[probe] min $name SKIPPED: " +
            Seq("x1", XN).flatMap(s => failed.get((name, s)).map(m => s"$s $m")).mkString("; "))
          None
      }
    }
    val json = rows.map { case (n, b, g, r) =>
      f""""$n":{"base_s":$b%.3f,"${XN}_s":$g%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val failJson = failed.toSeq.sortBy(_._1).map { case ((n, s), m) =>
      s""""$n@$s":${"\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe":"contract-10x","replicas":$Replicas,"queries":$json,"failed":$failJson}""")
    spark.stop()
  }

  /** Sequentially read every byte under `dir` so timed passes start from a
    * warm page cache (probe hosts have RAM ≫ corpus; the first touch is
    * the only cold one). Untimed by construction — called before the pass
    * loop. */
  private[graft] def warmDir(dir: String): Unit = {
    val buf = new Array[Byte](1 << 20)
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(walk) }
      else if (f.isFile) {
        val in = new java.io.FileInputStream(f)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }
    walk(new java.io.File(dir))
  }

  /** Derive both corpora (documents + embeddings + events — the tables
    * these families read). x1 is a plain 32-file copy of src; x10 is the
    * salted 10x replica set. 32 files each: a single part-file reads back
    * as ONE input partition, which would serialize the probe onto one
    * core — real corpora at either scale are always multi-file. */
  /** Per-replica orthogonal sign flip for the derived embedding corpus:
    * dim i negated iff murmur3(r, i) is odd — a ±1 diagonal depending on
    * (r, i) ONLY, so every vector in replica r shares one transform.
    * Exactness (spec-pinned in DedupSimilaritySpec): (dᵢxᵢ)(dᵢyᵢ) = xᵢyᵢ
    * PER TERM in float arithmetic (negation is exact), so within-replica
    * dot products — and thus cosines and the near-dup structure — are
    * BIT-IDENTICAL to the base corpus, while cross-replica patterns
    * differ in ~half the dims and cosines concentrate near 0. */
  private[graft] def signFlip(emb: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(emb, (x, i) =>
      when(pmod(hash(r, i), lit(2)) === 0, x).otherwise(-x).cast("float"))

  private def generate(spark: SparkSession, src: String, probe: String): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val ev = Tables.events(spark, src)
    val reps = explode(sequence(lit(0), lit(Replicas - 1))).as("r")
    docs.repartition(32).write.mode("overwrite").parquet(s"$probe/x1/documents.parquet")
    emb.repartition(32).write.mode("overwrite").parquet(s"$probe/x1/embeddings.parquet")
    ev.repartition(32).write.mode("overwrite").parquet(s"$probe/x1/events.parquet")
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"), reps)
      .select(
        (col("doc_id") * Replicas + col("r")).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1zq"), col("r")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$probe/$XN/documents.parquet")
    // replica 0 is the x1 corpus verbatim (same contract as documents);
    // replicas > 0 get a per-replica orthogonal sign-flip pattern (see the
    // file doc): dim i negated iff murmur3(r, i) is odd. Depends on (r, i)
    // only — every vector within a replica shares ONE ±1 diagonal, so
    // within-replica cosines (the near-dup structure) are preserved
    // exactly while cross-replica patterns differ in ~32 of 64 dims
    // (identical patterns for two replicas would need a 2^-64 murmur
    // collision). All-Spark-side `hash` (murmur3), fully deterministic.
    emb.select(col("vec_id"), col("embedding"), col("label"), reps)
      .select(
        (col("vec_id") * Replicas + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding"))
          .otherwise(signFlip(col("embedding"), col("r")))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$probe/$XN/embeddings.parquet")
    // events: replica-shift the entity keys, keep timestamps — 10x the
    // rows into the same time range (what ingest growth looks like),
    // per-user event sequences replicated intact.
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"), reps)
      .select(
        (col("event_id") * Replicas + col("r")).as("event_id"),
        col("ts"),
        (col("user_id") * Replicas + col("r")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$probe/$XN/events.parquet")

    // TPC-H-ish relational tables. Every foreign/primary key is shifted by
    // the SAME k*Replicas+r formula on both sides, so each fact row still
    // joins exactly its own dimension replica: join fan-out, selectivity,
    // and group cardinalities per key are preserved while facts AND
    // dimensions grow 10x together. nation/region are copied verbatim —
    // enum-like dims don't grow with the corpus (and their crossJoin
    // queries stay the intentional 25-row case). Non-key attributes repeat
    // verbatim across replicas — INCLUDING p_name, a deliberate round-8
    // decision after measuring the alternative. The round-7 verdict read
    // q_fuzzy_pairs' cross-replica levenshtein-0 pairs as a derivation
    // artifact and asked for perturbed replica names; round 8 tried it (a
    // replica-keyed 12-char prefix token, pairwise token distance >= 6
    // safely past tau = 5) and the measured 10x ratio got WORSE (13.9 ->
    // 28.9): the fixture's names are 7-12-char two-word strings from a
    // CLOSED 64-name vocabulary, so the token swallowed most names whole
    // and collapsed each replica's in-block catalog onto ONE string — a
    // far more degenerate corpus than verbatim copies. Verbatim IS the
    // organic model for this generator: the x1 20k-row catalog already
    // averages ~312 copies per name (2112 in-block duplicate (block,
    // name) groups), so an organically 10x-grown catalog multiplies
    // same-name in-block copies 10-fold exactly as replication does, and
    // tau=5 against 7-12-char names passes ~25% of even DISTINCT-name
    // candidates. The query's answer is therefore genuinely
    // Theta(block_pairs) — quadratic in scale — and its probe ratio must
    // be read as OUTPUT growth, not plan regression; the SURVEY row
    // records pairs/second at both scales to make that readable.
    // lineitem is written LAST: it is main()'s generation sentinel, so a
    // partially-failed generation regenerates in full.
    def shifted(df: DataFrame, keys: Seq[String]): DataFrame = {
      val withR = df.select(col("*"), reps)
      withR.select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) (col(c) * Replicas + col("r")).as(c) else col(c)
      }: _*)
    }
    val rel: Seq[(String, Seq[String], Int)] = Seq(
      ("orders", Seq("o_orderkey", "o_custkey"), 32),
      ("customer", Seq("c_custkey"), 8),
      ("supplier", Seq("s_suppkey"), 8),
      ("part", Seq("p_partkey"), 8),
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), 32))
    for (t <- Seq("nation", "region")) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.repartition(1).write.mode("overwrite").parquet(s"$probe/x1/$t.parquet")
      df.repartition(1).write.mode("overwrite").parquet(s"$probe/$XN/$t.parquet")
    }
    for ((t, keys, files) <- rel) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.repartition(files).write.mode("overwrite").parquet(s"$probe/x1/$t.parquet")
      shifted(df, keys).repartition(files)
        .write.mode("overwrite").parquet(s"$probe/$XN/$t.parquet")
    }
  }
}
