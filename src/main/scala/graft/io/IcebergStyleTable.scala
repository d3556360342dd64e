package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style table layout without the Iceberg runtime jar
  * (SURVEY §7.4 — no Iceberg artifact exists in /opt/spark/jars or the
  * offline cache, so the semantics the north-rule needs are realized
  * directly: Hive-layout partitioned parquet + JSON snapshot metadata,
  * snapshot-commit-last atomicity, and a salted repartition for skewed
  * partition keys).
  *
  * Layout:
  * {{{
  * <root>/data/<p1>=<v>/<p2>=<v>/part-*.parquet
  * <root>/metadata/snap-<n>.json        # files + row counts of snapshot n
  * <root>/metadata/v<n>.metadata.json   # schema, partition spec, snapshot
  * <root>/metadata/version-hint.text    # current version (atomic rename)
  * }}}
  *
  * Commit protocol (O4/S6 analog — the reference's single-transaction
  * SQLite commit log, backend/db.py:6-21): data files are written first
  * via Spark's job commit; the snapshot JSON is written next; the
  * version-hint rename is last, so readers either see the previous
  * complete snapshot or the new complete snapshot, never a partial one.
  */
object IcebergStyleTable {

  final case class Snapshot(version: Int, files: Seq[String], rowCount: Long)

  private def metaDir(root: String): Path = Paths.get(root, "metadata")
  private def dataDir(root: String): Path = Paths.get(root, "data")

  def currentVersion(root: String): Int = {
    val hint = metaDir(root).resolve("version-hint.text")
    if (Files.exists(hint))
      new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  private def listDataFiles(root: String): Set[String] = {
    val d = dataDir(root)
    if (!Files.exists(d)) Set.empty
    else Files.walk(d).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => dataDir(root).relativize(p).toString)
      .toSet
  }

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\")
    .replace("\"", "\\\"") + "\""

  /** Append `df` as a new snapshot, salting the shuffle on skewed keys.
    *
    * `partitionCols` become Hive partition directories; the physical
    * shuffle key is (partitionCols ++ salt) where salt =
    * pmod(xxhash64(saltCol), saltBuckets) — Zipf-skewed hosts/TLDs
    * (SURVEY §2.11) then bound the max output task instead of serializing
    * one reducer per hot partition.
    */
  def append(df: DataFrame, root: String, partitionCols: Seq[String],
             saltCol: String, saltBuckets: Int = 16,
             shufflePartitions: Int = 32): Snapshot = {
    Files.createDirectories(metaDir(root))
    val before = listDataFiles(root)

    val salted = df.repartition(shufflePartitions,
      (partitionCols.map(col) :+
        pmod(xxhash64(col(saltCol)), lit(saltBuckets))): _*)
    salted.write.mode("append")
      .partitionBy(partitionCols: _*)
      .parquet(dataDir(root).toString)

    val after = listDataFiles(root)
    val added = (after -- before).toSeq.sorted
    val rowCount = df.sparkSession.read
      .parquet(added.map(f => dataDir(root).resolve(f).toString): _*)
      .count()

    val version = currentVersion(root) + 1
    val snapJson =
      s"""{"version":$version,"added_files":[${added.map(q).mkString(",")}],
         |"added_rows":$rowCount,
         |"partition_spec":[${partitionCols.map(q).mkString(",")}],
         |"salt":{"column":${q(saltCol)},"buckets":$saltBuckets}}"""
        .stripMargin.replace("\n", "")
    Files.write(metaDir(root).resolve(s"snap-$version.json"),
      snapJson.getBytes(StandardCharsets.UTF_8))

    val schemaJson = df.schema.json
    val metaJson =
      s"""{"format-version":$version,"schema":$schemaJson,
         |"partition_spec":[${partitionCols.map(q).mkString(",")}],
         |"current_snapshot":$version}""".stripMargin.replace("\n", "")
    Files.write(metaDir(root).resolve(s"v$version.metadata.json"),
      metaJson.getBytes(StandardCharsets.UTF_8))

    // atomic last step: readers flip to the new snapshot only here
    val tmp = metaDir(root).resolve("version-hint.tmp")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir(root).resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    Snapshot(version, added, rowCount)
  }

  /** Read the table (partition-pruning capable: Hive layout + partition
    * columns are recovered by Spark's scan; filters on partition cols
    * prune directories for free). */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.option("basePath", dataDir(root).toString)
      .parquet(dataDir(root).toString)

  /** Rewrite the table's data files into at most `filesPerPartitionDir`
    * per partition directory and commit the result as a new snapshot —
    * the Iceberg `rewrite_data_files` analog. At fine partition
    * granularity (date x host_bucket) small scales produce tiny files;
    * compaction runs out-of-band and readers flip atomically via the
    * version hint (old files are left for time-travel; a GC pass would
    * remove files not referenced by retained snapshots).
    */
  def compact(spark: SparkSession, root: String, partitionCols: Seq[String],
              filesPerPartitionDir: Int = 1): Snapshot = {
    val current = read(spark, root)
    val tmp = Paths.get(root, "data_compact_tmp").toString
    current
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 0)
      .partitionBy(partitionCols: _*)
      .parquet(tmp)

    // swap: move compacted files into data/ as a new snapshot generation
    val dataPath = dataDir(root)
    val old = listDataFiles(root)
    val tmpFiles = Files.walk(Paths.get(tmp)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .toSeq
    tmpFiles.foreach { p =>
      val rel = Paths.get(tmp).relativize(p)
      val dest = dataPath.resolve(rel.toString)
      Files.createDirectories(dest.getParent)
      Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
    }
    // retire the pre-compaction files (single-snapshot retention here)
    old.foreach(f => Files.deleteIfExists(dataPath.resolve(f)))
    deleteRecursively(Paths.get(tmp))

    val added = (listDataFiles(root) -- Set.empty).toSeq.sorted
    val rowCount = read(spark, root).count()
    val version = currentVersion(root) + 1
    val snapJson =
      s"""{"version":$version,"compaction":true,
         |"added_files":[${added.map(q).mkString(",")}],
         |"added_rows":$rowCount,
         |"partition_spec":[${partitionCols.map(q).mkString(",")}]}"""
        .stripMargin.replace("\n", "")
    Files.write(metaDir(root).resolve(s"snap-$version.json"),
      snapJson.getBytes(StandardCharsets.UTF_8))
    val tmpHint = metaDir(root).resolve("version-hint.tmp")
    Files.write(tmpHint, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmpHint, metaDir(root).resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Snapshot(version, added, rowCount)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }

  def snapshots(root: String): Seq[Int] = {
    val m = metaDir(root)
    if (!Files.exists(m)) Seq.empty
    else Files.list(m).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snap-") =>
        s.stripPrefix("snap-").stripSuffix(".json").toInt }
      .toSeq.sorted
  }
}
