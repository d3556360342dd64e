package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.RunJob
import graft.io.{CheckpointedRun, IcebergStyleTable}
import graft.model.PagesSynth

/** End-to-end gate for the composed spark-submit entry (graft.RunJob):
  * pages parquet → QualityPipeline → CheckpointedRun → atomic
  * IcebergStyleTable commit, including the kill/resume path and the
  * exactly-once table-commit guard.
  */
class RunJobSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeInput(n: Long): String = {
    val in = tmpDir("runjob_in")
    PagesSynth.pages(spark, n, 4).write.mode("overwrite").parquet(in)
    in
  }

  test("argument parsing: required args enforced, flags mapped") {
    val a = RunJob.parseArgs(Array("--input", "/i", "--output", "/o",
      "--run-id", "r1", "--partitions", "6", "--salt-buckets", "4",
      "--shuffle-partitions", "3", "--prebucketed", "/p", "--compact"))
    assert(a == RunJob.JobArgs("/i", "/o", "r1", 6, 4, 3, Some("/p"),
      compact = true))
    intercept[IllegalArgumentException] {
      RunJob.parseArgs(Array("--input", "/i"))
    }
    intercept[IllegalArgumentException] {
      RunJob.parseArgs(Array("--bogus", "x"))
    }
  }

  test("full job: pipeline output lands in the table exactly once, with " +
      "per-partition metrics") {
    val in = writeInput(300)
    val args = RunJob.JobArgs(in, tmpDir("runjob_out"), "job1",
      partitions = 6, saltBuckets = 4, shufflePartitions = 4)
    val res = RunJob.execute(spark, args)
    assert(res.partitions.count(!_.skipped) == 6)
    assert(res.committedThisRun)
    assert(res.tableVersion == 1)
    assert(res.tableRows == 300)

    val table = IcebergStyleTable.read(spark, RunJob.tableRoot(args))
    assert(table.count() == 300)
    assert(table.select(countDistinct("url")).head().getLong(0) == 300)
    assert(table.columns.contains("part_date"))
    assert(table.columns.contains("scrubbed_text"))

    // O4: one metrics manifest per partition, queryable as a table
    val metrics = CheckpointedRun.metricsTable(spark,
      RunJob.workRoot(args), "job1")
    assert(metrics.count() == 6)
    assert(metrics.agg(sum("rows")).head().getLong(0) == 300)
  }

  test("input may be an Iceberg-style table root: rows resolved through " +
      "the snapshot manifest") {
    val tableIn = tmpDir("runjob_table_in")
    val pages = PagesSynth.pages(spark, 200, 4)
      .withColumn("pd", to_date(col("warc_ts")))
    IcebergStyleTable.append(pages, tableIn, Seq("pd"), "url", 4, 4)
    val args = RunJob.JobArgs(tableIn, tmpDir("runjob_out"), "job_t",
      partitions = 4, saltBuckets = 4, shufflePartitions = 4)
    val res = RunJob.execute(spark, args)
    assert(res.tableRows == 200)
    assert(IcebergStyleTable.read(spark, RunJob.tableRoot(args))
      .select(countDistinct("url")).head().getLong(0) == 200)
  }

  test("--compact: post-commit compaction produces a second snapshot " +
      "with identical rows") {
    val in = writeInput(300)
    val args = RunJob.JobArgs(in, tmpDir("runjob_out"), "job_c",
      partitions = 6, saltBuckets = 4, shufflePartitions = 6,
      compact = true)
    val res = RunJob.execute(spark, args)
    // snapshot 1 = the append, snapshot 2 = the compaction rewrite
    assert(res.tableVersion == 2)
    assert(res.tableRows == 300)
    assert(IcebergStyleTable.snapshots(RunJob.tableRoot(args)) == Seq(1, 2))
    val table = IcebergStyleTable.read(spark, RunJob.tableRoot(args))
    assert(table.count() == 300)
    assert(table.select(countDistinct("url")).head().getLong(0) == 300)
  }

  test("crash window closed: a kill between table commit and marker " +
      "write cannot duplicate the snapshot — the run_id stamped in the " +
      "snapshot JSON is the durable record") {
    val in = writeInput(200)
    val args = RunJob.JobArgs(in, tmpDir("runjob_out"), "job_w",
      partitions = 4, saltBuckets = 4, shufflePartitions = 4)
    val res1 = RunJob.execute(spark, args)
    assert(res1.committedThisRun && res1.tableRows == 200)
    // simulate the kill: the commit (hint flip) happened but the marker
    // write did not
    val marker = Paths.get(RunJob.workRoot(args), "_progress",
      "run=job_w", "_committed.json")
    assert(Files.exists(marker))
    Files.delete(marker)
    // rerun: must detect the snapshot's run_id, NOT append again
    val res2 = RunJob.execute(spark, args)
    assert(!res2.committedThisRun)
    assert(res2.tableRows == 200) // this run's contribution, not a rescan
    assert(IcebergStyleTable.snapshots(RunJob.tableRoot(args)) == Seq(1))
    assert(IcebergStyleTable.read(spark, RunJob.tableRoot(args))
      .count() == 200)
    // and the lost marker was healed for future fast-path reruns
    assert(Files.exists(marker))
  }

  test("kill/resume: a killed run resumes without recomputation and " +
      "commits the table once") {
    val in = writeInput(240)
    val args = RunJob.JobArgs(in, tmpDir("runjob_out"), "job2",
      partitions = 8, saltBuckets = 4, shufflePartitions = 4)

    // killed mid-run after 3 fresh partitions — no table commit happened
    intercept[RuntimeException] {
      RunJob.execute(spark, args, failAfter = 3)
    }
    assert(CheckpointedRun
      .completedPartitions(RunJob.workRoot(args), "job2").size == 3)
    assert(!Files.exists(
      Paths.get(RunJob.tableRoot(args), "metadata", "version-hint.text")))

    // resume: finishes the remaining 5, commits the table
    val res = RunJob.execute(spark, args)
    assert(res.partitions.count(_.skipped) == 3)
    assert(res.partitions.count(!_.skipped) == 5)
    assert(res.committedThisRun && res.tableVersion == 1)
    val table = IcebergStyleTable.read(spark, RunJob.tableRoot(args))
    assert(table.count() == 240)
    assert(table.select(countDistinct("url")).head().getLong(0) == 240)

    // re-submitting the finished run is a no-op: all partitions skip and
    // the _committed marker prevents a duplicate snapshot
    val res2 = RunJob.execute(spark, args)
    assert(res2.partitions.forall(_.skipped))
    assert(!res2.committedThisRun)
    assert(res2.tableVersion == 1 && res2.tableRows == 240)
    assert(IcebergStyleTable.snapshots(RunJob.tableRoot(args)) == Seq(1))
  }
}
