package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is STUBBED — this container ships no image/audio
  * codecs — behind [[MediaDecoder]]: [[StubDecoder]] produces
  * deterministic fake metadata from the content bytes so the Spark-side
  * plumbing (schema, batching, partitioning, feature shape) is real and
  * testable; a production deployment swaps in a codec-backed decoder with
  * the same signature (per-partition init, batch-shaped calls — the same
  * pattern `mapInPandas` gives PySpark).
  */
final case class MediaBlob(doc_id: Long, blob: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    duration_ms: Int,
    frame_offsets_ms: Seq[Int],
    content_hash: Long)

/** Batch decoder contract: called once per batch (not per row) so a real
  * implementation can amortize codec/context setup, exactly like a
  * vectorized UDF. Implementations must be deterministic per blob. */
trait MediaDecoder extends Serializable {
  /** (width, height, channels, duration_ms) per blob, batch at a time. */
  def decodeBatch(blobs: Seq[Array[Byte]]): Seq[(Int, Int, Int, Int)]
}

/** Deterministic stand-in decoder (STUB — see class docs; a real decoder
  * would parse the container/codec here). Metadata is a pure function of
  * the bytes, so tests and byte-identical-output checks hold.
  *
  * The fake dims derive from four plain scalars of the UTF-8 decode of
  * the blob — byte length, code-point length, first / last code point —
  * in straight-line 64-bit arithmetic, so the DuckDB oracle recomputes
  * them from the source text exactly (a round-1/2 version used an
  * iterated FNV mix whose Long overflow DuckDB's checked integers
  * reject; the point of the stub is the batch plumbing, not hash
  * strength). Scalars agree with DuckDB for BMP text (`length(text)` =
  * code points). */
object StubDecoder extends MediaDecoder {

  /** FNV-1a over raw bytes — kept for the content_hash column (dedup /
    * identity use; sbt-tested, not part of the oracle dump). */
  def contentHash(blob: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < blob.length) {
      h = (h ^ (blob(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  override def decodeBatch(blobs: Seq[Array[Byte]]): Seq[(Int, Int, Int, Int)] =
    blobs.map { b =>
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val olen = b.length.toLong
      val clen = s.codePointCount(0, s.length).toLong
      val first = if (s.isEmpty) 0L else s.codePointAt(0).toLong
      val last = if (s.isEmpty) 0L else s.codePointBefore(s.length).toLong
      // fake-but-plausible media dims; a real decoder replaces this body
      val width = (160L + (olen * 7919L + first * 131L) % 1760L).toInt
      val height = (90L + (clen * 104729L + last * 137L) % 990L).toInt
      val channels = (1L + (olen + first + last) % 3L).toInt
      val durationMs = (1000L + (olen * 2654435761L + clen * 40503L) % 59000L).toInt
      (width, height, channels, durationMs)
    }
}

object Multimodal {

  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Uniform frame sampling: offsets (ms) of up to `maxFrames` frames,
    * every `everyMs`, within [0, durationMs). */
  def frameSample(durationMs: Int, everyMs: Int, maxFrames: Int = 16): Seq[Int] = {
    if (durationMs <= 0 || everyMs <= 0) return Seq.empty
    (0 until durationMs by everyMs).take(maxFrames)
  }

  /** Partition-local batched feature extraction — the Scala analog of
    * `mapInPandas`: rows stream through in `batchSize` groups, the decoder
    * sees whole batches, output is a typed Dataset with a columnar-friendly
    * schema. No shuffle; partitioning is inherited from the input. */
  def extractFeatures(blobs: Dataset[MediaBlob],
                      decoder: MediaDecoder = StubDecoder,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val metas = decoder.decodeBatch(batch.map(_.blob))
        // fail loudly: a decoder that skips an undecodable blob instead of
        // throwing would otherwise misalign every following blob's
        // metadata via lazyZip truncation AND silently drop the last row —
        // per-blob failures belong in per-blob sentinel values, not in a
        // shortened batch
        require(metas.length == batch.length,
          s"decoder returned ${metas.length} metas for ${batch.length} blobs")
        batch.lazyZip(metas).map { case (b, (w, h, c, d)) =>
          MediaFeatures(b.doc_id, b.blob.length.toLong, w, h, c, d,
            frameSample(d, everyMs = 5000), StubDecoder.contentHash(b.blob))
        }
      }
    }
  }
}
