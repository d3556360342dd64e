package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.expr.GraftFunctions._
import graft.model.PagesSynth
import graft.pipeline.QualityPipeline

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the §2.11 graft-mandated stages and the training-data
  * ops layer), with DuckDB oracle SQL for every SQL-expressible one.
  *
  * Oracle-safety rules used throughout (driver compares sorted-column
  * value hashes): every aggregate/computed column is aliased identically
  * on both sides; integer results are BIGINT on both sides; float results
  * either come from a single arithmetic op on identical inputs (exact) or
  * go through DECIMAL; every query ends in a deterministic ORDER BY on a
  * unique key.
  */
object SparkEntry {

  private def withFns(s: SparkSession): SparkSession = {
    GraftFunctions.register(s); s
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    withFns(s).read.parquet(s"$dir/documents.parquet")

  /** Deterministic PII-planted text over the documents table — the same
    * construction is expressed in the DuckDB oracle, so regex stages can
    * be cross-checked per pattern. Pure integer/concat ops only. */
  private val piiTextSql: String =
    "concat(text, ' Contact: user', cast(doc_id as string), " +
      "'@example.com or (415) 555-', cast(1000 + doc_id % 9000 as string), " +
      "'. SSN: ', cast(100 + doc_id % 900 as string), '-', " +
      "cast(10 + doc_id % 89 as string), '-', " +
      "cast(1000 + doc_id % 8999 as string), " +
      "'. Host 10.', cast(doc_id % 250 as string), '.', " +
      "cast(doc_id % 100 as string), '.', cast(1 + doc_id % 50 as string), '.')"

  private val piiTextDuck: String =
    "text || ' Contact: user' || doc_id || '@example.com or (415) 555-' || " +
      "(1000 + doc_id % 9000) || '. SSN: ' || (100 + doc_id % 900) || '-' || " +
      "(10 + doc_id % 89) || '-' || (1000 + doc_id % 8999) || " +
      "'. Host 10.' || (doc_id % 250) || '.' || (doc_id % 100) || '.' || " +
      "(1 + doc_id % 50) || '.'"

  /** Deterministic dup/near-dup planting for the dedup operators. */
  private val dupTextSql: String =
    "case when doc_id % 11 < 2 then concat('duplicate cluster ', " +
      "cast(doc_id % 3 as string)) else text end"
  private val dupTextDuck: String =
    "case when doc_id % 11 < 2 then 'duplicate cluster ' || (doc_id % 3) " +
      "else text end"

  /** Near-dup groups: every 25th doc becomes a shared base paragraph with a
    * tiny per-doc tail, giving ~20 docs in 4 high-Jaccard clusters. */
  private val nearDupSql: String =
    "case when doc_id % 25 = 0 then concat(" +
      "'the quick brown fox jumps over the lazy dog while the wise old owl " +
      "watches from the tall oak tree near the quiet river bank every " +
      "single morning of the long warm summer season tail variant ', " +
      "cast(doc_id % 4 as string)) else text end"

  private def rules(c: Column, lang: Column) = quality_rules(c, lang)

  private def ruleValue(rs: Column, name: String): Column =
    filter(rs, r => r("rule") === lit(name))(0)("value")
  private def ruleFired(rs: Column, name: String): Column =
    filter(rs, r => r("rule") === lit(name))(0)("fired")

  private val basicRuleNames = Seq("word_count_min", "word_count_max",
    "mean_word_length_min", "mean_word_length_max", "symbol_to_word_ratio",
    "alpha_word_ratio", "stopword_count", "lorem_ipsum", "curly_brace",
    "min_sentence_count")

  /** Flagship: the full quality-filter pipeline over a synthesized pages
    * table at sf0.001 scale; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    withFns(spark)
    QualityPipeline(PagesSynth.pages(spark, 500, 8))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S1/S2: source scan + projection + residual validation ----
    "s1_scan_project" -> ((s, dir) =>
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")),

    // ---- P1: branch predicate (extract vs direct route) ----
    "p1_branch_route" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        when(length(trim(col("text"))) === 0, lit("extract"))
          .otherwise(lit("direct")).as("route"))
        .orderBy("doc_id")),

    // ---- G1 + P2: tokenizer with running offsets, blank-filtered ----
    "g1_tokenize_stats" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        word_count(col("text")).as("n_words"),
        length(extract_text(col("text"))).cast("long").as("full_text_len"))
        .orderBy("doc_id")),

    // ---- D1-D3: fused multi-pattern scan (per-type counts, planted) ----
    "d1_pii_counts" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("pii_text", expr(piiTextSql))
        .withColumn("ms", pii_extract(col("pii_text")))
      def cnt(t: String) = size(filter(col("ms"),
        m => m("pii_type") === lit(t))).cast("long")
      d.select(col("doc_id"),
        cnt("SSN").as("n_ssn"), cnt("Email").as("n_email"),
        cnt("Phone Number").as("n_phone"), cnt("IP Address").as("n_ip"))
        .orderBy("doc_id")
    }),

    // ---- D1 full lineage: match structs (offsets + labels) ----
    "d2_pii_matches" -> ((s, dir) =>
      docs(s, dir).withColumn("pii_text", expr(piiTextSql))
        .select(col("doc_id"),
          pii_extract(col("pii_text")).as("pii_matches"))
        .orderBy("doc_id")),

    // ---- J1+J2+R1: span join + whole-token scrub ----
    "j2_scrub" -> ((s, dir) =>
      docs(s, dir).withColumn("pii_text", expr(piiTextSql))
        .withColumn("p", pii_process(col("pii_text")))
        .select(col("doc_id"), col("p.scrubbed_text").as("scrubbed_text"),
          col("p.n_redacted").cast("long").as("n_redacted"))
        .orderBy("doc_id")),

    // ---- langid stage (SURVEY §2.11) ----
    "langid_pred" -> ((s, dir) =>
      docs(s, dir).withColumn("lid", langid(col("text")))
        .select(col("doc_id"), col("lid.lang").as("lang_pred"),
          round(col("lid.conf"), 4).as("lang_conf"))
        .orderBy("doc_id")),

    // ---- perplexity stage (SURVEY §2.11) ----
    "perplexity_score" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          round(perplexity(col("text"), col("lang")), 4).as("ppl"))
        .orderBy("doc_id")),

    // ---- Gopher/C4 heuristics: integer-exact observables ----
    "heuristics_basic" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("rs", rules(col("text"), lit("en")))
      val fired = basicRuleNames.map(n => ruleFired(col("rs"), n))
        .reduce(_ || _)
      d.select(col("doc_id"),
        ruleValue(col("rs"), "word_count_min").cast("long").as("word_count"),
        ruleValue(col("rs"), "stopword_count").cast("long").as("stopword_count"),
        ruleValue(col("rs"), "min_sentence_count").cast("long").as("sentences"),
        ruleValue(col("rs"), "lorem_ipsum").cast("long").as("has_lorem"),
        ruleValue(col("rs"), "curly_brace").cast("long").as("has_curly"),
        (!fired).as("keep_basic"))
        .orderBy("doc_id")
    }),

    // ---- keep/drop aggregate per language ----
    "keep_stats" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("rs", rules(col("text"), lit("en")))
      val fired = basicRuleNames.map(n => ruleFired(col("rs"), n))
        .reduce(_ || _)
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!fired, 1L).otherwise(0L)).as("n_keep"))
        .orderBy("lang")
    }),

    // ---- O4/O5: metrics aggregate (per source) ----
    "o4_metrics" -> ((s, dir) =>
      docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("source")),

    // ---- full pipeline over synthesized pages (rows-only; golden +
    //      parity tests in ScalaTest) ----
    "pipeline_full" -> ((s, dir) => {
      withFns(s)
      val n = if (dir.contains("0.001")) 500L else 2000L
      QualityPipeline(PagesSynth.pages(s, n, 16))
        .select(col("url"), col("lang_pred"), round(col("lang_conf"), 4).as("lang_conf"),
          round(col("perplexity"), 4).as("perplexity"), col("keep"),
          col("scrubbed_text"), col("n_redacted").cast("long").as("n_redacted"),
          col("host_bucket").cast("long").as("host_bucket"))
        .orderBy("url")
    }),

    // ---- dedup: exact (hash groups, planted duplicates) ----
    "dedup_exact" -> ((s, dir) =>
      docs(s, dir).withColumn("t", expr(dupTextSql))
        .groupBy(md5(col("t")).as("text_hash"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("min_doc_id"))
        .filter(col("n_dups") > 1)
        .orderBy("text_hash")),

    // ---- dedup: MinHash + LSH band-join candidate pairs (planted) ----
    // Scale shape: only (doc_id, band) longs flow through the self-join
    // shuffle; signatures are re-attached to the (small) distinct candidate
    // set afterwards. At real scale the signature table is materialized
    // once and both steps read it — same plan, one less recompute.
    "dedup_minhash_pairs" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("t", expr(nearDupSql))
      val bandRows = d.select(col("doc_id"),
        explode(lsh_bands(col("t"))).as("band"))
      val cand = bandRows.as("a").join(bandRows.as("b"),
          col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val sigs = d.select(col("doc_id"), minhash(col("t")).as("sig"))
      cand.join(sigs.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("id_b") === col("sb.doc_id"))
        .select(col("id_a"), col("id_b"),
          aggregate(zip_with(col("sa.sig"), col("sb.sig"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).as("n_eq_hashes"))
        .filter(col("n_eq_hashes") >= 64) // est. Jaccard >= 0.5 of 128
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup: SimHash per doc ----
    "dedup_simhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), simhash(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // ---- dedup: 3-gram-shingle Jaccard over planted near-dup clusters ----
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("t", expr(nearDupSql))
        .filter(expr("doc_id % 25 = 0"))
        .select(col("doc_id"), shingles(col("t")).as("sh"))
      val sh = d.select(col("doc_id"), explode(col("sh")).as("w"))
      val pair = sh.as("a").join(sh.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_inter"))
      val sizes = d.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
      pair.join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
        .select(col("id_a"), col("id_b"), col("n_inter"),
          (col("sa.n") + col("sb.n") - col("n_inter")).as("n_union"))
        .filter(col("n_inter") * lit(10) >= col("n_union") * lit(8)) // J>=0.8
        .orderBy("id_a", "id_b")
    }),

    // ---- fingerprinting ----
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        fingerprint(col("text")).as("fp"), simhash(col("text")).as("sh"))
        .orderBy("doc_id")),

    // ---- text analysis: token counting (whitespace + BPE-ish regex) ----
    "text_token_counts" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        word_count(col("text")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .cast("long").as("bpe_tokens"))
        .orderBy("doc_id")),

    // ---- similarity: brute-force cosine top-k ----
    "knn_bruteforce" -> ((s, dir) => {
      val emb = withFns(s).read.parquet(s"$dir/embeddings.parquet")
        .withColumn("emb", col("embedding").cast("array<double>"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"))
      emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(cosine(col("emb"), col("q_emb")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    }),

    // ---- similarity: LSH-bucketed ANN (sign random projection) ----
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = withFns(s).read.parquet(s"$dir/embeddings.parquet")
        .withColumn("emb", col("embedding").cast("array<double>"))
      // sign projection onto one fixed pseudo-random hyperplane (weights a
      // deterministic function of the dimension index)
      val withBucket = emb.withColumn("bucket",
        aggregate(
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => pmod(i * 2654435761L, lit(1000)).cast("double") / 500.0 - 1.0),
            (x, h) => x.cast("double") * h),
          lit(0.0), (acc, v) => acc + v) > 0)
      val q = withBucket.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"), col("bucket").as("q_bucket"))
      withBucket.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .filter(col("bucket") === col("q_bucket"))
        .select(col("vec_id"),
          round(cosine(col("emb"), col("q_emb")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    }),

    // ---- streaming-shaped: tumbling window aggregation over events ----
    "events_window" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(window(col("ts"), "5 minutes").getField("start")
          .as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          sum(col("value").cast("decimal(18,6)")).as("sum_value"))
        .orderBy("window_start", "event_type")),

    // ---- relational coverage: agg / broadcast join / window top-k ----
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q2_join_topn" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
        .orderBy("n_name")
    }),

    "q3_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = s.read.parquet(s"$dir/orders.parquet")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("price"),
          col("rn").cast("long").as("rn"))
        .orderBy("o_custkey", "rn", "o_orderkey")
    }),

    // ---- relational coverage: set ops (EXCEPT/INTERSECT) ----
    "q4_setop" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val p = s.read.parquet(s"$dir/part.parquet")
      val used = li.select(col("l_partkey").as("p_partkey")).distinct()
      val large = p.filter(col("p_size") > 25).select(col("p_partkey"))
      used.intersect(large).withColumnRenamed("p_partkey", "partkey")
        .union(used.exceptAll(used)) // exercise both set ops in one plan
        .orderBy("partkey")
    }),

    // ---- relational coverage: ROLLUP grouping sets ----
    "q5_rollup" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // ---- dedup: embedding-cosine near-dup pairs (planted, oracled) ----
    // Planted near-copies: vec_id % 25 == 0 gets a perturbed twin at
    // vec_id + 100000; pairwise cosine >= 0.8 recovers exactly the 20
    // planted pairs. Brute-force pairwise here (500 rows); at scale the
    // LSH/IVF bucketing below prunes the candidate set first.
    "dedup_embedding_pairs" -> ((s, dir) => {
      val emb = withFns(s).read.parquet(s"$dir/embeddings.parquet")
      val asD = col("embedding").cast("array<double>")
      // DuckDB list lambdas index 1-based; mirror with (i + 1)
      val planted = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(asD, (x, i) =>
            x + (((i + 1) * 37 % 11) - 5).cast("double") / 200.0).as("emb"))
      val base = emb.select(col("vec_id"), asD.as("emb")).union(planted)
      val cos = cosine(col("a.emb"), col("b.emb"))
      base.as("a").join(broadcast(base.as("b")),
          col("a.vec_id") < col("b.vec_id"))
        .filter(cos >= 0.8)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(cos, 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // ---- similarity: IVF-bucketed ANN (coarse quantizer = first-K seed
    //      centroids, search only the query's cell — the scale path) ----
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = withFns(s).read.parquet(s"$dir/embeddings.parquet")
        .withColumn("emb", col("embedding").cast("array<double>"))
      // coarse centroids: the first 8 vectors (deterministic seed choice;
      // a production build would k-means these — assignment plan is the same)
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("sim", cosine(col("emb"), col("cent")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("sim").desc, col("cent_id"))))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("emb"), col("cent_id"))
      val q = assigned.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"), col("cent_id").as("q_cent"))
      assigned.filter(col("vec_id") =!= 0).join(broadcast(q),
          col("cent_id") === col("q_cent"))
        .select(col("vec_id"),
          round(cosine(col("emb"), col("q_emb")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    }),

    // ---- text analysis: composite quality score (oracled) ----
    "quality_score" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("rs", rules(col("text"), lit("en")))
      val wc = ruleValue(col("rs"), "word_count_min")
      val alpha = ruleValue(col("rs"), "alpha_word_ratio")
      val stop = ruleValue(col("rs"), "stopword_count")
      val sent = ruleValue(col("rs"), "min_sentence_count")
      d.select(col("doc_id"),
        round(least(wc, lit(200.0)) / 200.0 * 0.25 + alpha * 0.25 +
          least(stop, lit(8.0)) / 8.0 * 0.25 +
          least(sent, lit(20.0)) / 20.0 * 0.25, 6).as("quality_score"))
        .orderBy("doc_id")
    }),

    // ---- multimodal plumbing: opaque binary + batched stub decode ----
    "mm_decode_features" -> ((s, dir) => {
      import s.implicits._
      val blobs = docs(s, dir)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
        .as[graft.ops.MediaBlob]
      graft.ops.Multimodal.extractFeatures(blobs)
        .toDF()
        .withColumn("n_frames", size(col("frame_offsets_ms")).cast("long"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: column-level fake meta (pure SQL plumbing) ----
    "mm_meta_extract" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("blob", encode(col("text"), "utf-8"))
        .select(col("doc_id"),
          length(col("blob")).cast("long").as("blob_bytes"),
          // STUBBED decode (no image/audio libs in this container): fake,
          // deterministic metadata derived from content; the Spark-side
          // plumbing (binary col, batched expr, schema) is real.
          pmod(xxhash64(col("blob")), lit(1920)).cast("long").as("fake_width"),
          pmod(xxhash64(col("blob"), lit(1)), lit(1080)).cast("long").as("fake_height"))
        .orderBy("doc_id")))

  def oracleSql: Map[String, String] = Map(
    "q4_setop" ->
      ("SELECT partkey FROM (" +
        "SELECT DISTINCT l_partkey AS partkey FROM lineitem " +
        "INTERSECT SELECT p_partkey FROM part WHERE p_size > 25) " +
        "ORDER BY partkey"),

    "q5_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n_rows, " +
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),

    "dedup_embedding_pairs" ->
      ("WITH planted AS (SELECT vec_id + 100000 AS vec_id, " +
        "list_transform(CAST(embedding AS DOUBLE[]), (x, i) -> " +
        "x + ((i * 37) % 11 - 5) / 200.0) AS emb " +
        "FROM embeddings WHERE vec_id % 25 = 0), " +
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
        "FROM embeddings UNION ALL SELECT vec_id, emb FROM planted) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine " +
        "FROM base a JOIN base b ON a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.8 " +
        "ORDER BY id_a, id_b"),

    "quality_score" -> {
      val words = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
      val wc = s"len($words)"
      val alpha = s"len(list_filter($words, w -> regexp_matches(w, '\\p{L}')))"
      val stop = s"len(list_filter(['the','be','to','of','and','that','have'," +
        s"'with'], sw -> list_contains(list_transform($words, w -> lower(w)), sw)))"
      val sent = "len(regexp_extract_all(text, '[.!?。]'))"
      s"SELECT doc_id, round(" +
        s"least($wc, 200.0) / 200.0 * 0.25 + " +
        s"(CASE WHEN $wc > 0 THEN $alpha * 1.0 / $wc ELSE 0.0 END) * 0.25 + " +
        s"least($stop, 8.0) / 8.0 * 0.25 + " +
        s"least($sent, 20.0) / 20.0 * 0.25, 6) AS quality_score " +
        s"FROM documents ORDER BY doc_id"
    },

    "s1_scan_project" ->
      ("SELECT doc_id, source, n_chars FROM documents WHERE text IS NOT NULL " +
        "ORDER BY doc_id"),

    "p1_branch_route" ->
      ("SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 'extract' " +
        "ELSE 'direct' END AS route FROM documents ORDER BY doc_id"),

    "g1_tokenize_stats" ->
      ("SELECT doc_id, " +
        "len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) " +
        "AS n_words, " +
        "length(array_to_string(list_filter(regexp_split_to_array(text, " +
        "'\\s+'), w -> w <> ''), ' ')) AS full_text_len " +
        "FROM documents ORDER BY doc_id"),

    "d1_pii_counts" ->
      (s"SELECT doc_id, " +
        s"len(regexp_extract_all($piiTextDuck, '\\d{3}-\\d{2}-\\d{4}')) AS n_ssn, " +
        s"len(regexp_extract_all($piiTextDuck, " +
        s"'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email, " +
        s"len(regexp_extract_all($piiTextDuck, " +
        s"'\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}')) AS n_phone, " +
        s"len(regexp_extract_all($piiTextDuck, " +
        s"'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ip " +
        s"FROM documents ORDER BY doc_id"),

    "heuristics_basic" -> {
      val words = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
      val wc = s"len($words)"
      val totalChars = s"len(array_to_string($words, '')) "
      val symbols = "(len(regexp_extract_all(text, '#')) + " +
        "len(regexp_extract_all(text, '…')) + " +
        "len(regexp_extract_all(text, '\\.\\.\\.')))"
      val alpha = s"len(list_filter($words, w -> regexp_matches(w, '\\p{L}')))"
      val stop = s"len(list_filter(['the','be','to','of','and','that','have'," +
        s"'with'], sw -> list_contains(list_transform($words, w -> lower(w)), sw)))"
      val sent = "len(regexp_extract_all(text, '[.!?。]'))"
      val lorem = "CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END"
      val curly = "CASE WHEN contains(text, '{') THEN 1 ELSE 0 END"
      s"SELECT doc_id, $wc AS word_count, $stop AS stopword_count, " +
        s"$sent AS sentences, $lorem AS has_lorem, $curly AS has_curly, " +
        s"NOT ($wc < 50 OR $wc > 100000 " +
        s"OR ($wc > 0 AND ($totalChars * 1.0 / $wc) < 3.0) " +
        s"OR ($totalChars * 1.0 / $wc) > 10.0 " +
        s"OR ($symbols * 1.0 / $wc) > 0.1 " +
        s"OR ($wc > 0 AND ($alpha * 1.0 / $wc) < 0.8) " +
        s"OR $stop < 2 OR $lorem > 0 OR $curly > 0 OR $sent < 3) AS keep_basic " +
        s"FROM documents ORDER BY doc_id"
    },

    "keep_stats" -> {
      val words = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
      val wc = s"len($words)"
      val totalChars = s"len(array_to_string($words, '')) "
      val symbols = "(len(regexp_extract_all(text, '#')) + " +
        "len(regexp_extract_all(text, '…')) + " +
        "len(regexp_extract_all(text, '\\.\\.\\.')))"
      val alpha = s"len(list_filter($words, w -> regexp_matches(w, '\\p{L}')))"
      val stop = s"len(list_filter(['the','be','to','of','and','that','have'," +
        s"'with'], sw -> list_contains(list_transform($words, w -> lower(w)), sw)))"
      val sent = "len(regexp_extract_all(text, '[.!?。]'))"
      val lorem = "CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END"
      val curly = "CASE WHEN contains(text, '{') THEN 1 ELSE 0 END"
      s"SELECT lang, count(*) AS n_docs, " +
        s"sum(CASE WHEN NOT ($wc < 50 OR $wc > 100000 " +
        s"OR ($wc > 0 AND ($totalChars * 1.0 / $wc) < 3.0) " +
        s"OR ($totalChars * 1.0 / $wc) > 10.0 " +
        s"OR ($symbols * 1.0 / $wc) > 0.1 " +
        s"OR ($wc > 0 AND ($alpha * 1.0 / $wc) < 0.8) " +
        s"OR $stop < 2 OR $lorem > 0 OR $curly > 0 OR $sent < 3) " +
        s"THEN 1 ELSE 0 END) AS n_keep " +
        s"FROM documents GROUP BY lang ORDER BY lang"
    },

    "o4_metrics" ->
      ("SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars, " +
        "max(n_chars) AS max_chars FROM documents GROUP BY source " +
        "ORDER BY source"),

    "dedup_exact" ->
      (s"SELECT md5($dupTextDuck) AS text_hash, count(*) AS n_dups, " +
        s"min(doc_id) AS min_doc_id FROM documents " +
        s"GROUP BY 1 HAVING count(*) > 1 ORDER BY text_hash"),

    "text_token_counts" ->
      ("SELECT doc_id, " +
        "len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) " +
        "AS ws_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) " +
        "AS bpe_tokens FROM documents ORDER BY doc_id"),

    "knn_bruteforce" ->
      ("WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb " +
        "FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, round(list_cosine_similarity(" +
        "CAST(embedding AS DOUBLE[]), q_emb), 4) " +
        "AS cosine FROM embeddings, q WHERE vec_id <> 0 " +
        "ORDER BY cosine DESC, vec_id LIMIT 10"),

    "dedup_ngram_jaccard" -> {
      val base = "'the quick brown fox jumps over the lazy dog while the " +
        "wise old owl watches from the tall oak tree near the quiet river " +
        "bank every single morning of the long warm summer season tail " +
        "variant ' || (doc_id % 4)"
      s"WITH w AS (SELECT doc_id, " +
        s"list_transform(list_filter(string_split(" +
        s"CASE WHEN doc_id % 25 = 0 THEN $base ELSE text END, ' '), " +
        s"x -> x <> ''), x -> lower(x)) AS ws " +
        s"FROM documents WHERE doc_id % 25 = 0), " +
        s"d AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN " +
        s"list_distinct(list_transform(range(0, len(ws) - 2), " +
        s"i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) " +
        s"ELSE [array_to_string(ws, ' ')] END AS sh FROM w), " +
        s"sh AS (SELECT doc_id, unnest(d.sh) AS w FROM d), " +
        s"pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        s"count(*) AS n_inter FROM sh a JOIN sh b ON a.w = b.w " +
        s"AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        s"sizes AS (SELECT doc_id, len(d.sh) AS n FROM d) " +
        s"SELECT id_a, id_b, n_inter, sa.n + sb.n - n_inter AS n_union " +
        s"FROM pair JOIN sizes sa ON id_a = sa.doc_id " +
        s"JOIN sizes sb ON id_b = sb.doc_id " +
        s"WHERE n_inter * 10 >= (sa.n + sb.n - n_inter) * 8 " +
        s"ORDER BY id_a, id_b"
    },

    "events_window" ->
      ("SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, " +
        "event_type, count(*) AS n, min(value) AS min_value, " +
        "max(value) AS max_value, " +
        "sum(CAST(value AS DECIMAL(18,6))) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"),

    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price, " +
        "count(*) AS n_rows FROM lineitem GROUP BY 1, 2 " +
        "ORDER BY l_returnflag, l_linestatus"),

    "q2_join_topn" ->
      ("SELECT n_name, count(*) AS n_orders, " +
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),

    "q3_window_topk" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey"))
}
