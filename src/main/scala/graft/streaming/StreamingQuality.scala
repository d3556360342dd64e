package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the engine (SURVEY §2.9): the quality pipeline is
  * stateless per-row, so [[graft.pipeline.QualityPipeline]] runs unchanged
  * under Structured Streaming (`readStream` → same transform →
  * `writeStream`; asserted batch==stream in StreamingSpec). This object
  * adds the genuinely stateful streaming operator the batch engine cannot
  * express: cross-micro-batch first-seen URL dedup via
  * `flatMapGroupsWithState` — the streaming analog of exact dedup, keyed
  * on the content fingerprint so re-crawled identical pages are dropped
  * while changed pages pass.
  */
object StreamingQuality {

  final case class SeenState(seenFingerprints: Seq[Long])

  /** Emits exactly the rows whose (url, content fingerprint) was not seen
    * before — neither in any earlier micro-batch nor earlier in the same
    * batch. State: the SET of fingerprints seen per URL (so content
    * alternating A→B→A is emitted twice, not three times, and two distinct
    * fresh fingerprints in one batch both pass). TTL is the caller's
    * checkpoint retention (a production run bounds the set and expires
    * keys with `GroupStateTimeout`).
    */
  def dedupFirstSeen(pages: DataFrame): Dataset[(String, String)] = {
    implicit val strEnc = Encoders.STRING
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stEnc = Encoders.product[SeenState]
    implicit val tEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING,
      Encoders.scalaLong)
    val keyed = pages
      .select(col("url"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("fp", xxhash64(col("text")))
      .as[(String, String, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (url: String, rows: Iterator[(String, String, Long)],
       state: GroupState[SeenState]) =>
        val seen = scala.collection.mutable.LinkedHashSet[Long](
          state.getOption.map(_.seenFingerprints).getOrElse(Seq.empty): _*)
        val out = Vector.newBuilder[(String, String)]
        rows.foreach { case (u, t, fp) =>
          if (seen.add(fp)) out += ((u, t)) // first occurrence ever wins
        }
        val fresh = out.result()
        if (fresh.nonEmpty) state.update(SeenState(seen.toSeq))
        fresh.iterator
    }
  }
}
