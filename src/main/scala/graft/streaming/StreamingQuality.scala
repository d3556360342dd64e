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

  final case class SeenState(firstSeenFingerprint: Long)

  /** Emits only rows whose (url, content fingerprint) was not seen in any
    * earlier micro-batch. State: one fingerprint per URL group; TTL is the
    * caller's checkpoint retention (no timeout here — URLs are the keys a
    * production run would expire with `GroupStateTimeout`).
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
        val seen = state.getOption.map(_.firstSeenFingerprint)
        val fresh = rows.filter { case (_, _, fp) => !seen.contains(fp) }
          .toSeq.headOption // first occurrence in this batch wins
        fresh.foreach { case (_, _, fp) => state.update(SeenState(fp)) }
        fresh.map { case (u, t, _) => (u, t) }.iterator
    }
  }
}
