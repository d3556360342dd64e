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
    * batch. State: the set of fingerprints seen per URL (so content
    * alternating A→B→A is emitted twice, not three times, and two distinct
    * fresh fingerprints in one batch both pass).
    *
    * State is BOUNDED in both dimensions — at crawl scale (10^9 URLs) an
    * unbounded first-seen map is the one structure that grows without
    * limit, so the bounds are in code, not left to callers:
    *
    *   - per key: at most `maxFingerprints` fingerprints, LRU eviction
    *     (a hit refreshes recency, so the actively recurring fingerprint
    *     is retained and stale one-offs evict first; an evicted
    *     fingerprint that re-appears is re-emitted — the standard recall
    *     trade-off of bounded dedup);
    *   - across keys: `ProcessingTimeTimeout` of `ttl` — a URL not crawled
    *     within the TTL has its state dropped at the next micro-batch, and
    *     a later re-crawl is treated as first-seen again.
    *
    * Trigger note: with `ProcessingTimeTimeout`,
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` always requests a
    * follow-up batch (processing time always advances), so
    * `Trigger.AvailableNow` appends timeout-draining no-data batches and
    * terminates slowly; drive catch-up runs with `Trigger.Once` (one
    * batch) and continuous runs with a processing-time trigger.
    */
  def dedupFirstSeen(pages: DataFrame, ttl: String = "24 hours",
                     maxFingerprints: Int = 1024): Dataset[(String, String)] = {
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
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (url: String, rows: Iterator[(String, String, Long)],
       state: GroupState[SeenState]) =>
        if (state.hasTimedOut) {
          // TTL expiry: drop the key's state entirely; a later re-crawl of
          // this URL re-enters as first-seen (asserted in StreamingSpec)
          state.remove()
          Iterator.empty
        } else {
          val seen = scala.collection.mutable.LinkedHashSet[Long](
            state.getOption.map(_.seenFingerprints).getOrElse(Seq.empty): _*)
          val out = Vector.newBuilder[(String, String)]
          rows.foreach { case (u, t, fp) =>
            if (seen.contains(fp)) {
              // refresh recency on a hit (true LRU): without the
              // remove+re-add, a page's CURRENT content — re-seen every
              // batch, inserted long ago — would be the FIRST fingerprint
              // evicted once stale one-offs fill the cap, and the very
              // next unchanged re-crawl would re-emit as "first seen"
              seen.remove(fp)
              seen.add(fp)
            } else {
              seen.add(fp)
              out += ((u, t)) // first occurrence wins
            }
          }
          // cap: evict least-recently-SEEN first (LinkedHashSet preserves
          // insertion order and hits re-insert, so head is the LRU entry)
          while (seen.size > maxFingerprints) seen.remove(seen.head)
          val fresh = out.result()
          state.update(SeenState(seen.toSeq))
          state.setTimeoutDuration(ttl)
          fresh.iterator
        }
    }
  }
}
