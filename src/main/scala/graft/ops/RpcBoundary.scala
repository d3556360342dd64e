package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

/** Exemplar of the external-service boundary pattern — the reference's OCR
  * RPC (S3, `backend/pdf/GoogleDocumentAI.py:33-57`: a per-process client
  * object reused across requests, called per document batch). The sandbox
  * is zero-egress, so no real transport ships; the PATTERN is the
  * deliverable and is fully testable with an in-JVM transport:
  *
  *   - ONE client per task (lazy init inside `mapPartitions`, never
  *     serialized from the driver, closed via task-completion listener) —
  *     per-row client construction is the classic 100 TB anti-pattern;
  *   - micro-batched requests (amortize RPC/codec overhead, bound memory);
  *   - bounded retry with a deterministic backoff schedule;
  *   - per-item fault isolation: a batch that still fails after retries is
  *     degraded to per-item calls, and only the truly poisoned items map
  *     through `onError` — one bad document never fails a stage (O1).
  */
trait RpcClient[Req, Resp] extends AutoCloseable {
  /** Process one micro-batch; must be deterministic per request and
    * return EXACTLY one response per request, in order. */
  def call(batch: Seq[Req]): Seq[Resp]
  override def close(): Unit = ()
}

/** A client returned the wrong number of responses for a batch — silent
  * row loss / fabrication, not a transient fault: this must FAIL THE
  * TASK (Spark retries it; an operator investigates the client), never
  * be retried into the output or data-fied through `onError`. */
final class RpcContractViolation(msg: String) extends RuntimeException(msg)

object RpcBoundary {

  /** Map `ds` through an external client with the discipline above.
    *
    * @param mkClient  client factory, invoked once per task ON THE EXECUTOR
    * @param onError   fallback row for an item that failed all attempts
    * @param backoffMs deterministic retry schedule; its length bounds the
    *                  number of retries
    */
  def mapWithClient[A, B: Encoder](
      ds: Dataset[A],
      mkClient: () => RpcClient[A, B],
      onError: (A, Throwable) => B,
      batchSize: Int = 32,
      backoffMs: Seq[Long] = Seq(10L, 100L, 1000L)): Dataset[B] = {
    ds.mapPartitions { it =>
      lazy val client = {
        val c = mkClient()
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => c.close()))
        c
      }

      // NonFatal only: task kills (InterruptedException) and VM errors
      // must propagate — retrying or data-fying them would commit
      // corrupted output instead of failing the task. RpcContractViolation
      // also propagates: a response-count mismatch is a client BUG
      // (silent row loss), not a transient to degrade around.
      import scala.util.control.NonFatal

      def checked(reqs: Seq[A]): Seq[B] = {
        val r = client.call(reqs)
        if (r.length != reqs.length)
          throw new RpcContractViolation(
            s"client returned ${r.length} responses for ${reqs.length} requests")
        r
      }

      // per-item calls get the SAME full backoff schedule as the batch:
      // a transient blip during degradation must not permanently convert
      // a good row into an onError row (only truly poisoned items may)
      def callItemWithRetry(item: A): B = {
        var a = 0
        var lastErr: Throwable = null
        while (a <= backoffMs.length) {
          try return checked(Seq(item)).head
          catch {
            case v: RpcContractViolation => throw v
            case NonFatal(ie) =>
              lastErr = ie
              if (a < backoffMs.length) Thread.sleep(backoffMs(a))
              a += 1
          }
        }
        onError(item, lastErr)
      }

      def callWithRetry(batch: Seq[A]): Seq[B] = {
        var attempt = 0
        while (true) {
          try return checked(batch)
          catch {
            case v: RpcContractViolation => throw v
            case NonFatal(_) if attempt < backoffMs.length =>
              Thread.sleep(backoffMs(attempt))
              attempt += 1
            case NonFatal(_) if batch.length > 1 =>
              // degrade to per-item calls: isolate the poisoned rows
              return batch.map(callItemWithRetry)
            case NonFatal(e) =>
              return Seq(onError(batch.head, e))
          }
        }
        throw new IllegalStateException("unreachable")
      }

      it.grouped(batchSize).flatMap(callWithRetry)
    }
  }
}
