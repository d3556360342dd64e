package graft.core

import java.util.concurrent.atomic.LongAdder

/** Per-stage wall-time accounting for the fused pipeline (BASELINE.json:
  * "per-stage metrics (langid, perplexity, heuristics, scrub) logged per
  * partition").
  *
  * The fused pass cannot be timed from the plan (one expression), so
  * [[DocProcessor]] adds ~5 `nanoTime` reads per document (&lt;0.1% of
  * per-doc cost) into JVM-wide [[LongAdder]]s. In local mode the
  * checkpointed runner snapshots them per partition job; on a cluster the
  * same counters feed per-executor metric sinks (they are additive and
  * require no synchronization on the hot path).
  */
object StageTimers {

  val stages: IndexedSeq[String] =
    IndexedSeq("tokenize", "pii_scrub", "langid", "perplexity", "heuristics")

  private val nanos: Map[String, LongAdder] =
    stages.map(_ -> new LongAdder).toMap
  private val docs = new LongAdder

  @inline def add(stage: String, dt: Long): Unit = nanos(stage).add(dt)
  @inline def addDoc(): Unit = docs.increment()

  /** Current totals in nanos, plus processed doc count. */
  def snapshot(): (Map[String, Long], Long) =
    (stages.map(s => s -> nanos(s).sum()).toMap, docs.sum())

  /** Delta between two snapshots. */
  def delta(before: (Map[String, Long], Long),
            after: (Map[String, Long], Long)): (Map[String, Long], Long) =
    (stages.map(s => s -> (after._1(s) - before._1(s))).toMap,
      after._2 - before._2)
}
