package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable batch execution with per-partition progress manifests and
  * per-stage metrics (SURVEY §7.6; BASELINE.json: "checkpoints
  * per-partition progress and metrics so a killed run resumes without
  * recomputation").
  *
  * The precedent is the reference's OCR response cache
  * (backend/pdf/PDFAdapter.py:104-127): an expensive stage keyed by a
  * stable identity, where a hit replays the stored result instead of
  * recomputing. Here the unit is a *logical partition* —
  * `pmod(xxhash64(url), P)` — so membership is a pure function of the row
  * (stable under any input re-partitioning), outputs land in
  * deterministic per-partition directories, and the manifest is written
  * only after the partition's output commits (write-then-rename, so a
  * kill can never leave a manifest without its data).
  *
  * Resume: list completed manifests, process only the missing partitions.
  * Metrics: one JSON manifest per (run, partition) with row counters from
  * `Dataset.observe` per stage (langid / perplexity / heuristics / scrub)
  * plus wall time — the O4 commit-log analog, queryable as a table via
  * [[metricsTable]].
  */
object CheckpointedRun {

  final case class PartitionResult(partition: Int, rows: Long, skipped: Boolean)

  /** Files per staged bucket directory (bounded total: P x this). */
  final val StagedSubsplits = 8

  private def progressDir(root: String, runId: String) =
    Paths.get(root, "_progress", s"run=$runId")

  def completedPartitions(root: String, runId: String): Set[Int] = {
    val d = progressDir(root, runId)
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("partition=") &&
            n.endsWith(".json") =>
          n.stripPrefix("partition=").stripSuffix(".json").toInt }
        .toSet
      finally s.close()
    }
  }

  /** Run `transform` over `input` split into `numPartitions` logical
    * partitions by `keyCol`; completed partitions are skipped on resume.
    * `failAfter` (test hook) aborts after that many fresh partitions —
    * the "killed run" of the resume test (SURVEY §5.4.6).
    *
    * Scan discipline: the input is bucketed ONCE into a staged
    * Hive-partitioned copy (`_staged/run=<id>/_bucket=<k>`), so a fresh
    * run reads the source exactly once; each logical partition then reads
    * only its own bucket directory (partition pruning — `.explain` shows a
    * single-directory scan). The previous formulation filtered the raw
    * source per partition = P full scans, a non-starter at 100 TB.
    * Resume reuses the staged copy (it is keyed by run id and committed
    * via Spark's _SUCCESS marker before any partition starts).
    *
    * Zero-copy mode: when the input ALREADY lives in the staged layout —
    * a `_bucket=<k>` Hive-partitioned parquet keyed by the same
    * pmod(xxhash64(key), P) (e.g. the previous pipeline stage wrote it
    * bucketed) — pass it as `prebucketed` and the staging rewrite is
    * skipped entirely: at 100 TB the staging pass doubles IO for nothing.
    * Per-partition reads prune to one `_bucket` directory either way.
    */
  def run(spark: SparkSession, input: DataFrame, keyCol: String,
          transform: DataFrame => DataFrame, root: String, runId: String,
          numPartitions: Int = 8,
          failAfter: Int = Int.MaxValue,
          prebucketed: Option[String] = None): Seq[PartitionResult] = {
    Files.createDirectories(progressDir(root, runId))
    val done = completedPartitions(root, runId)

    // a run's partition scheme is part of its identity: resuming the same
    // runId with a different numPartitions would silently skip buckets
    // (staged copy AND completion manifests are keyed by the old scheme)
    val partsFile = progressDir(root, runId).resolve("_num_partitions")
    if (Files.exists(partsFile)) {
      val prev = new String(Files.readAllBytes(partsFile),
        StandardCharsets.UTF_8).trim.toInt
      require(prev == numPartitions,
        s"run $runId was started with numPartitions=$prev; " +
          s"resume must use the same value (got $numPartitions)")
    } else {
      Files.write(partsFile,
        numPartitions.toString.getBytes(StandardCharsets.UTF_8))
    }

    // fully-completed rerun: skip staging entirely — the staged copy is
    // deleted after completion (below), and rebuilding it just to skip
    // every partition would be a full input copy for nothing. Still
    // attempt the staged-dir reclamation: a kill DURING the end-of-run
    // cleanup leaves a partial _staged/run=<id> orphan that only this
    // path would ever see again (the rerun returns here before reaching
    // the post-loop cleanup).
    if (done.size >= numPartitions) {
      if (prebucketed.isEmpty) reclaimStaged(root, runId)
      return (0 until numPartitions)
        .map(k => PartitionResult(k, -1, skipped = true))
    }

    val staged = prebucketed match {
      case Some(path) =>
        // zero-copy: trust-but-verify the layout — the bucket scheme is
        // part of the run's identity, so a wrong-P / wrong-key input must
        // fail loudly here, not silently route rows to the wrong resume
        // partitions
        val dirStream = Files.list(Paths.get(path))
        val maxBucket =
          try dirStream.iterator().asScala
            .map(_.getFileName.toString)
            .collect { case s if s.startsWith("_bucket=") =>
              s.stripPrefix("_bucket=").toInt }
            .maxOption.getOrElse(-1)
          finally dirStream.close()
        require(maxBucket >= 0,
          s"prebucketed input at $path has no _bucket=<k> directories")
        require(maxBucket < numPartitions,
          s"prebucketed input at $path has _bucket=$maxBucket >= " +
            s"numPartitions=$numPartitions — bucket scheme mismatch")
        // a SMALLER-P or differently-keyed layout also passes the dir
        // checks — verify actual membership on a bounded PER-BUCKET sample
        // (any mismatched scheme puts ~(1-1/P) of rows in the wrong
        // bucket). Sampling a few rows from EVERY _bucket directory, not
        // a global limit(N) — which Spark satisfies from the first file(s)
        // and so can draw all N rows from one directory — also catches a
        // layout where only SOME bucket directories are mis-keyed. Cost:
        // one limit-32 read per directory (first row group only),
        // independent of input size; a full-scan check would defeat
        // zero-copy.
        val ds2 = Files.list(Paths.get(path))
        val bucketDirs =
          try ds2.iterator().asScala
            .filter(_.getFileName.toString.startsWith("_bucket="))
            .map(p => (p.getFileName.toString.stripPrefix("_bucket=").toLong,
              p.toString))
            .toSeq.sortBy(_._1)
          finally ds2.close()
        // bounded work at production P: every directory is checked when
        // P <= 64; beyond that a deterministic evenly-strided 64-dir
        // subset is (a wrong key/P corrupts essentially every bucket, so
        // 64 dirs catch a global mismatch with certainty and a partial
        // mis-keying with high probability). The limit-32 reads run a few
        // at a time on the scheduler instead of P sequential driver
        // round-trips.
        // CEIL stride: floor + take(64) would check only the FIRST 64
        // dirs for 64 < P < 128, never sampling the upper buckets — a
        // layout mis-keyed only in its tail would pass
        val step = (bucketDirs.size + 63) / 64
        val sampled = bucketDirs.indices.collect {
          case idx if idx % math.max(1, step) == 0 => bucketDirs(idx)
        }.take(64)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, math.max(1, sampled.size)))
        try {
          val futures = sampled.map { case (k, dir) =>
            pool.submit(new java.util.concurrent.Callable[(Long, Long)] {
              override def call(): (Long, Long) = {
                // a legitimately row-less bucket dir (empty, or only a
                // _SUCCESS marker) has nothing to verify — tolerate the
                // schema-inference failure for EXACTLY that case. Any
                // other layout (nested partition dirs, oddly-suffixed
                // files) still goes through the real read, so a
                // mis-keyed prebucketed input cannot dodge verification
                // by its file naming.
                val bad =
                  try spark.read.parquet(dir)
                    .select(col(keyCol)).limit(32)
                    .filter(pmod(xxhash64(col(keyCol)), lit(numPartitions))
                      .cast("long") =!= k)
                    .count()
                  catch {
                    // error-condition match first (version-stable);
                    // message substring kept as a fallback for builds
                    // predating the condition name
                    case e: org.apache.spark.sql.AnalysisException
                        if e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
                          (e.getMessage != null &&
                            e.getMessage.contains("Unable to infer schema")) =>
                      0L
                  }
                (k, bad)
              }
            })
          }
          futures.map(_.get()).foreach { case (k, bad) =>
            require(bad == 0,
              s"prebucketed input at $path is not bucketed by " +
                s"pmod(xxhash64($keyCol), $numPartitions): $bad sampled " +
                s"row(s) in _bucket=$k land outside their directory")
          }
        } finally pool.shutdown()
        spark.read.parquet(path)
      case None =>
        val stagedPath = Paths.get(root, "_staged", s"run=$runId").toString
        if (!Files.exists(Paths.get(stagedPath, "_SUCCESS"))) {
          // Repartition ON THE BUCKET KEY before the partitioned write.
          // The direct form (withColumn + partitionBy, no shuffle) has
          // every input task write into up to P bucket directories —
          // tasks x P files, which at production scale (10^5 input
          // splits x 4096 buckets) is a catastrophic file-count
          // explosion for any metadata layer. One shuffle keyed by
          // (_bucket, subsplit) bounds output to ~StagedSubsplits files
          // per bucket: the subsplit (an independent hash of the same
          // key) keeps each bucket readable with intra-bucket
          // parallelism even before row-group splitting kicks in.
          input
            .withColumn("_bucket",
              pmod(xxhash64(col(keyCol)), lit(numPartitions)))
            .withColumn("_subsplit",
              pmod(xxhash64(col(keyCol), lit(0x5eed)), lit(StagedSubsplits)))
            .repartition(numPartitions * StagedSubsplits,
              col("_bucket"), col("_subsplit"))
            .drop("_subsplit")
            .write.mode("overwrite").partitionBy("_bucket").parquet(stagedPath)
        }
        spark.read.parquet(stagedPath)
    }

    var fresh = 0
    val results = (0 until numPartitions).map { k =>
      if (done.contains(k)) PartitionResult(k, -1, skipped = true)
      else {
        if (fresh >= failAfter)
          throw new RuntimeException(s"injected failure before partition $k")
        fresh += 1
        val st0 = graft.core.StageTimers.snapshot()
        val t0 = System.nanoTime()
        // filter on the Hive partition column prunes to one directory
        val part = staged.filter(col("_bucket") === k).drop("_bucket")
        val out = transform(part)
        val outPath = Paths.get(root, s"run=$runId", s"partition=$k").toString
        out.write.mode("overwrite").parquet(outPath)

        // per-stage metrics from the committed output (one cheap scan of
        // the partition's own parquet — no recompute of the pipeline).
        // Schema-tolerant + null-safe: (a) sum() over an EMPTY partition
        // (every row filtered, or fewer rows than partitions) returns
        // NULL and a bare getLong would NPE AFTER the data committed but
        // BEFORE the manifest — resume would then re-crash on the same
        // partition forever; (b) a non-pipeline transform lacks the
        // quality columns — its metrics degrade to zero instead of
        // failing the run post-write
        val written = spark.read.parquet(outPath)
        val cols = written.columns.toSet
        def m0(c: Column): Column = coalesce(c, lit(0L))
        val m = written.agg(
          count(lit(1)).as("rows"),
          (if (cols("keep"))
            m0(sum(when(col("keep"), 1L).otherwise(0L)))
          else lit(0L)).as("n_keep"),
          (if (cols("n_redacted")) m0(sum(col("n_redacted").cast("long")))
          else lit(0L)).as("scrub_n_redacted"),
          (if (cols("lang_conf"))
            m0(sum(when(col("lang_conf") <
              lit(graft.model.PagesSynth.LangConfMin), 1L).otherwise(0L)))
          else lit(0L)).as("langid_n_low_conf"),
          (if (cols("perplexity"))
            m0(sum(when(col("perplexity") >
              lit(graft.model.PagesSynth.PerplexityMax), 1L).otherwise(0L)))
          else lit(0L)).as("perplexity_n_high"),
          (if (cols("rule_lineage"))
            m0(sum(size(filter(col("rule_lineage"), r => r("fired")))
              .cast("long")))
          else lit(0L)).as("heuristics_n_fired")).collect()(0)
        val rows = m.getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        val (stageNanos, _) =
          graft.core.StageTimers.delta(st0, graft.core.StageTimers.snapshot())
        def sn(st: String): Double = stageNanos.getOrElse(st, 0L) / 1e9

        val manifest =
          s"""{"run_id":"$runId","partition":$k,"rows":$rows,
             |"n_keep":${m.getLong(1)},
             |"stages":{"scrub":{"n_redacted":${m.getLong(2)},
             |"cpu_sec":${sn("pii_scrub")}},
             |"langid":{"n_low_conf":${m.getLong(3)},"cpu_sec":${sn("langid")}},
             |"perplexity":{"n_high":${m.getLong(4)},
             |"cpu_sec":${sn("perplexity")}},
             |"heuristics":{"n_fired":${m.getLong(5)},
             |"cpu_sec":${sn("heuristics")}},
             |"tokenize":{"cpu_sec":${sn("tokenize")}}},
             |"wall_sec":$wall}""".stripMargin.replace("\n", "")
        // write-then-rename: manifest appears only after data committed
        val tmp = progressDir(root, runId).resolve(s"partition=$k.tmp")
        Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, progressDir(root, runId).resolve(s"partition=$k.json"),
          StandardCopyOption.ATOMIC_MOVE)
        PartitionResult(k, rows, skipped = false)
      }
    }
    // every partition is complete: reclaim the staged input copy —
    // leaving it would permanently double storage for every finished run
    // (at the 100 TB design point, a 100 TB orphan per run id). Only the
    // run's OWN staged dir is touched; prebucketed inputs belong to the
    // caller. A rerun after this cleanup takes the all-skipped early
    // return above (which retries this reclamation, healing a kill that
    // landed mid-deletion) and never re-reads the staged path.
    if (prebucketed.isEmpty) reclaimStaged(root, runId)
    results
  }

  private def reclaimStaged(root: String, runId: String): Unit = {
    val stagedPath = Paths.get(root, "_staged", s"run=$runId")
    if (Files.exists(stagedPath)) {
      val s = Files.walk(stagedPath)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  /** Read the final output of a (possibly resumed) run. */
  def output(spark: SparkSession, root: String, runId: String): DataFrame =
    spark.read.parquet(Paths.get(root, s"run=$runId").toString + "/partition=*")

  /** The metrics manifests as a queryable DataFrame (metrics table, O4).
    * Only `partition=<k>.json` manifests qualify — the progress dir also
    * holds RunJob's `_committed.json` commit marker, whose different
    * schema would union in a spurious mostly-null row. */
  def metricsTable(spark: SparkSession, root: String, runId: String): DataFrame = {
    val d = progressDir(root, runId)
    val s = Files.list(d)
    val files =
      try s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("partition=") && n.endsWith(".json")
        }
        .map(_.toString).toSeq
      finally s.close()
    spark.read.json(files: _*)
  }
}
