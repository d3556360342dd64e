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
  /** Process one micro-batch; must be deterministic per request. */
  def call(batch: Seq[Req]): Seq[Resp]
  override def close(): Unit = ()
}

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

      def callWithRetry(batch: Seq[A]): Seq[B] = {
        // NonFatal only: task kills (InterruptedException) and VM errors
        // must propagate — retrying or data-fying them would commit
        // corrupted output instead of failing the task
        import scala.util.control.NonFatal
        var attempt = 0
        while (true) {
          try return client.call(batch)
          catch {
            case NonFatal(_) if attempt < backoffMs.length =>
              Thread.sleep(backoffMs(attempt))
              attempt += 1
            case NonFatal(_) if batch.length > 1 =>
              // degrade to per-item calls: isolate the poisoned rows
              return batch.map { item =>
                try client.call(Seq(item)).head
                catch { case NonFatal(ie) => onError(item, ie) }
              }
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
