package graft

import org.apache.spark.sql.SparkSession

/** Auxiliary measurement harness for the optimization rounds — NOT the
  * driver bench (graft.Bench is frozen; this main adds isolation
  * measurements per guide §1.4 without touching it).
  *
  * Modes (first arg):
  *   kernels [nDocs]    — single-threaded per-stage and sub-stage µs/doc
  *                        over deterministic PagesSynth texts (the same
  *                        input population as the pipeline bench).
  *   query <name> [n]   — run one declared query n times (default 3) on
  *                        $SPARK_GRAFT_SF_DIR with the noop sink, print
  *                        each wall time; `explain` env var dumps the
  *                        formatted plan first.
  *   queries [n]        — all declared bench queries, n repeats each.
  *   pipeline [nDocs]   — noop-sink pipeline pass at $SPARK_GRAFT_CPUS,
  *                        repeated 3x, with per-stage µs/doc deltas.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .withExtensions(new graft.expr.GraftExtensions)
      .getOrCreate()
  }

  private def texts(n: Int): Array[String] = {
    // the pipeline's raw_text population: text when present, else the
    // html extraction (the P1 branch), skipping rows with neither
    (0L until n.toLong).iterator.map { id =>
      val (_, row) = graft.model.PagesSynth.generate(id, validated = false)
      row.text.getOrElse(row.html.map(b =>
        graft.core.HtmlText.extract(new String(b,
          java.nio.charset.StandardCharsets.UTF_8))).getOrElse(""))
    }.toArray
  }

  private def time[A](label: String, reps: Int)(body: => A): Unit = {
    var r = 0
    while (r < reps) {
      val t0 = System.nanoTime()
      val a = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s ${dt}%8.3f s   (rep ${r + 1})  [${a.hashCode}%08x]")
      r += 1
    }
  }

  def kernels(nDocs: Int): Unit = {
    println(s"[kernels] generating $nDocs deterministic texts…")
    val ts = texts(nDocs)
    val totalChars = ts.iterator.map(_.length.toLong).sum
    println(f"[kernels] ${ts.length} docs, mean ${totalChars * 1.0 / ts.length}%.0f chars")

    def usPerDoc(label: String)(body: String => Any): Unit = {
      // warmup + 3 measured reps
      var rep = 0
      val out = new StringBuilder(f"  $label%-28s")
      while (rep < 4) {
        var acc = 0L // defeat DCE
        val t0 = System.nanoTime()
        var i = 0
        while (i < ts.length) { acc ^= body(ts(i)).hashCode.toLong; i += 1 }
        val us = (System.nanoTime() - t0) / 1e3 / ts.length
        if (rep > 0) out.append(f" ${us}%7.2f")
        if (acc == 42424242L) println("!") // never
        rep += 1
      }
      println(out.append(" us/doc").result())
    }

    import graft.core._
    usPerDoc("process (full fused)")(DocProcessor.process)
    usPerDoc("tokenizeArrays")(Tokenizer.tokenizeArrays)
    usPerDoc("pii extract")(t => PiiDetector.extract(t))
    usPerDoc("langid.predict")(LangId.predict)
    usPerDoc("perplexityWords") { t =>
      val w = Tokenizer.words(t)
      NGramLM.perplexityWords(w, "en")
    }
    usPerDoc("heuristics evaluateWith") { t =>
      Heuristics.evaluateWith(t, Tokenizer.words(t), "en")
    }
    // heuristics sub-stages
    usPerDoc("  scanText")(Heuristics.scanText)
    usPerDoc("  words (tokenize only)")(Tokenizer.words)
    usPerDoc("  words+toLowerCase") { t =>
      Tokenizer.words(t).map(_.toLowerCase(java.util.Locale.ROOT))
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    args.headOption.getOrElse("kernels") match {
      case "kernels" =>
        kernels(args.lift(1).map(_.toInt).getOrElse(20000))

      case "query" =>
        val name = args(1)
        val reps = args.lift(2).map(_.toInt).getOrElse(3)
        val s = session(cpus)
        s.sparkContext.setLogLevel("WARN")
        if (sys.env.contains("GRAFT_EXPLAIN"))
          println(SparkEntry.queries(name)(s, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        if (sys.env.contains("GRAFT_EXPLAIN_FINAL")) {
          // execute on the frame's own QueryExecution so the printed
          // plan is the FINAL adaptive one (ReusedExchange visible)
          val df = SparkEntry.queries(name)(s, sfDir)
          df.foreach(_ => ())
          println(df.queryExecution.executedPlan.toString)
        }
        time(name, reps) {
          SparkEntry.queries(name)(s, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        s.stop()

      case "queries" =>
        val reps = args.lift(1).map(_.toInt).getOrElse(2)
        val s = session(cpus)
        s.sparkContext.setLogLevel("WARN")
        Seq("d1_pii_counts", "d3_pii_financial", "j2_scrub", "langid_pred",
          "perplexity_score", "heuristics_basic", "toxicity_blocklist",
          "quality_score", "dedup_exact", "dedup_minhash_pairs",
          "dedup_clusters", "dedup_simhash", "dedup_embedding_pairs",
          "dedup_ngram_jaccard", "text_fingerprint", "knn_bruteforce",
          "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_auto", "emb_quantize_int8",
          "mm_decode_features", "mm_meta_extract", "events_window", "q1_agg",
          "q2_join_topn", "q3_window_topk", "q4_setop", "q5_rollup")
          .foreach { name =>
            s.sparkContext.setJobDescription(name)
            time(name, reps) {
              SparkEntry.queries(name)(s, sfDir)
                .write.format("noop").mode("overwrite").save()
            }
          }
        s.stop()

      case "pipeline" =>
        val nDocs = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val s = session(cpus)
        s.sparkContext.setLogLevel("WARN")
        val path = s"target/benchextra_pages_$nDocs"
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(path, "_SUCCESS")))
          graft.model.PagesSynth.pages(s, nDocs, 64, validated = false)
            .write.mode("overwrite").parquet(path)
        if (sys.env.contains("GRAFT_EXPLAIN"))
          println(graft.pipeline.QualityPipeline(s.read.parquet(path))
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        var r = 0
        while (r < 4) {
          val st0 = graft.core.StageTimers.snapshot()
          val t0 = System.nanoTime()
          graft.pipeline.QualityPipeline(s.read.parquet(path))
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          val (ns, nd) = graft.core.StageTimers.delta(st0,
            graft.core.StageTimers.snapshot())
          val stages = graft.core.StageTimers.stages.map(st =>
            f"$st=${ns(st) / 1e3 / math.max(1, nd)}%.1f").mkString(" ")
          println(f"  pipeline rep$r: ${dt}%6.3f s  ($stages us/doc)")
          r += 1
        }
        s.stop()

      case other => sys.error(s"unknown mode: $other")
    }
  }
}
