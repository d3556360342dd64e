package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.io.{CheckpointedRun, IcebergStyleTable}
import graft.pipeline.QualityPipeline

/** The production face of the engine — the composed spark-submit entry the
  * north star describes ("scales to 10^12 documents via spark-submit"):
  *
  * {{{
  * spark-submit --class graft.RunJob <jar> \
  *   --input  <pages parquet/dir>          \
  *   --output <job root>                   \
  *   --run-id <stable id>                  \
  *   [--partitions 32] [--salt-buckets 16] [--shuffle-partitions 32] \
  *   [--prebucketed <path>]
  * }}}
  *
  * Composition (each piece is the SURVEY operator it names):
  *   1. read the pages table `(url, warc_ts, html, text, lang)`;
  *   2. [[QualityPipeline]] — the fused per-document quality filter;
  *   3. [[CheckpointedRun.run]] — resumable execution over `--partitions`
  *      logical url-hash partitions with per-partition progress manifests
  *      and stage metrics (O2-O4): re-running the SAME `--run-id` after a
  *      kill skips completed partitions;
  *   4. [[IcebergStyleTable.append]] — one atomic snapshot commit of the
  *      run's output into `<output>/table`, Hive-partitioned by
  *      `part_date` with a url-salted shuffle (S5/S6, skew §2.11).
  *
  * The final commit is guarded by a `_committed.json` marker inside the
  * run's progress dir: a job killed between table commit and exit (or
  * re-submitted after success) resumes to a no-op instead of appending a
  * duplicate snapshot. Killed BEFORE the commit, the rerun skips all
  * completed partitions and performs just the commit — so the table holds
  * the run's rows exactly once under any kill/retry schedule.
  *
  * Job identity is the explicit `--run-id` (O2 — no wall clock), and the
  * partition count is part of that identity (CheckpointedRun refuses a
  * resume with a different `--partitions`).
  */
object RunJob {

  final case class JobArgs(
      input: String = "",
      output: String = "",
      runId: String = "",
      partitions: Int = 32,
      saltBuckets: Int = 16,
      shufflePartitions: Int = 32,
      prebucketed: Option[String] = None,
      compact: Boolean = false)

  /** `tableRows` is always THIS RUN's contributed row count — on a fresh
    * commit from the append snapshot, on a resumed-after-commit rerun
    * from the run's recorded snapshot metadata (no table scan). */
  final case class JobResult(
      partitions: Seq[CheckpointedRun.PartitionResult],
      tableVersion: Int,
      tableRows: Long,
      committedThisRun: Boolean)

  def parseArgs(argv: Array[String]): JobArgs = {
    var a = JobArgs()
    var i = 0
    def value(flag: String): String = {
      require(i + 1 < argv.length, s"$flag requires a value")
      argv(i + 1)
    }
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = value("--input")); i += 2
        case "--output" => a = a.copy(output = value("--output")); i += 2
        case "--run-id" => a = a.copy(runId = value("--run-id")); i += 2
        case "--partitions" =>
          a = a.copy(partitions = value("--partitions").toInt); i += 2
        case "--salt-buckets" =>
          a = a.copy(saltBuckets = value("--salt-buckets").toInt); i += 2
        case "--shuffle-partitions" =>
          a = a.copy(shufflePartitions =
            value("--shuffle-partitions").toInt); i += 2
        case "--prebucketed" =>
          a = a.copy(prebucketed = Some(value("--prebucketed"))); i += 2
        case "--compact" => a = a.copy(compact = true); i += 1
        case other =>
          throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    require(a.input.nonEmpty && a.output.nonEmpty && a.runId.nonEmpty,
      "--input, --output and --run-id are required")
    a
  }

  def workRoot(args: JobArgs): String = s"${args.output}/work"
  def tableRoot(args: JobArgs): String = s"${args.output}/table"
  private def commitMarker(args: JobArgs) =
    Paths.get(workRoot(args), "_progress", s"run=${args.runId}",
      "_committed.json")

  /** The whole job; `failAfter` is the kill-injection test hook
    * (CheckpointedRun's — aborts after N fresh partitions). */
  def execute(spark: SparkSession, args: JobArgs,
              failAfter: Int = Int.MaxValue): JobResult = {
    graft.expr.GraftFunctions.register(spark)
    // input may be an Iceberg-style table root (the north rule's input
    // shape — resolved through its snapshot manifest, so an in-flight
    // commit on the source table is invisible) or a plain parquet dir
    val pages =
      if (Files.exists(
          Paths.get(args.input, "metadata", "version-hint.text")))
        IcebergStyleTable.read(spark, args.input)
      else spark.read.parquet(args.input)

    val results = CheckpointedRun.run(spark, pages, keyCol = "url",
      transform = QualityPipeline.apply, root = workRoot(args),
      runId = args.runId, numPartitions = args.partitions,
      failAfter = failAfter, prebucketed = args.prebucketed)

    // Exactly-once commit detection: the DURABLE record is the run_id
    // stamped into the snapshot JSON at the atomic hint flip (the marker
    // alone had a crash window — a kill between hint flip and marker
    // write would make the rerun append a duplicate snapshot). The
    // marker remains as a fast path and a metrics record.
    val marker = commitMarker(args)
    val recorded = IcebergStyleTable
      .findSnapshotWithMeta(tableRoot(args), "run_id", args.runId)
    if (Files.exists(marker) || recorded.isDefined) {
      // already committed by a previous attempt — resume is a no-op;
      // report this run's contributed rows from its snapshot record. The
      // version must be ATTRIBUTABLE to this run: the snapshot's stamped
      // run_id, or the version recorded in this run's own marker. Falling
      // back to currentVersion would attribute a LATER run's snapshot
      // (and its added_rows) to this run if other runs committed since.
      val markerVersion: Option[Int] =
        if (Files.exists(marker)) {
          val txt = new String(Files.readAllBytes(marker),
            StandardCharsets.UTF_8)
          """"snapshot_version"\s*:\s*(\d+)""".r
            .findFirstMatchIn(txt).map(_.group(1).toInt)
        } else None
      val v = recorded.orElse(markerVersion)
      if (!Files.exists(marker) && v.isDefined) // heal lost marker
        Files.write(marker,
          s"""{"run_id":"${args.runId}","snapshot_version":${v.get},"rows":${IcebergStyleTable.snapshotAddedRows(tableRoot(args), v.get)}}"""
            .getBytes(StandardCharsets.UTF_8))
      // unattributable (marker unparseable AND no stamped snapshot —
      // cannot happen through this code's own write order, which stamps
      // the snapshot first): report rows as 0 rather than guessing
      JobResult(results, IcebergStyleTable.currentVersion(tableRoot(args)),
        v.map(IcebergStyleTable.snapshotAddedRows(tableRoot(args), _))
          .getOrElse(0L),
        committedThisRun = false)
    } else {
      val out = CheckpointedRun.output(spark, workRoot(args), args.runId)
      val snap = IcebergStyleTable.append(out, tableRoot(args),
        partitionCols = Seq("part_date"), saltCol = "url",
        saltBuckets = args.saltBuckets,
        shufflePartitions = args.shufflePartitions,
        extraMeta = Map("run_id" -> args.runId))
      Files.write(marker,
        s"""{"run_id":"${args.runId}","snapshot_version":${snap.version},"rows":${snap.rowCount}}"""
          .getBytes(StandardCharsets.UTF_8))
      // optional out-of-band small-file compaction: a new snapshot with
      // an atomic flip — readers never see a partial rewrite. Runs AFTER
      // the commit record: a kill during compaction leaves the appended
      // snapshot live and the rerun a no-op (compaction is re-runnable
      // maintenance, not part of the run's exactly-once contract).
      val finalVersion =
        if (args.compact)
          IcebergStyleTable.compact(spark, tableRoot(args),
            Seq("part_date"),
            saltBuckets = math.min(4, args.saltBuckets)).version
        else snap.version
      JobResult(results, finalVersion, snap.rowCount,
        committedThisRun = true)
    }
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName(s"graft-quality-filter-${args.runId}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val res = execute(spark, args)
    val fresh = res.partitions.count(!_.skipped)
    val skipped = res.partitions.count(_.skipped)
    // one JSON status line + the per-partition metrics table location
    println(
      s"""{"run_id":"${args.runId}","partitions_fresh":$fresh,""" +
        s""""partitions_skipped":$skipped,""" +
        s""""table_version":${res.tableVersion},""" +
        s""""table_rows":${res.tableRows},""" +
        s""""committed_this_run":${res.committedThisRun},""" +
        s""""metrics":"${workRoot(args)}/_progress/run=${args.runId}"}""")
    spark.stop()
  }
}
