package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed partition-wise through typed Datasets.
  *
  * The decode step is a STUB (this environment has no image/audio codecs):
  * `decodeMeta` derives deterministic fake metadata from the leading bytes,
  * and `sampleFrames` slices deterministic fake frames. Everything around the
  * stub — the binary column, case-class schemas/Encoders, `mapPartitions`
  * batch shape (the JVM analog of an Arrow-batched Python UDF), the frame
  * fan-out, partition-preserving execution — is real and oracle-tested
  * (MultimodalQueries).
  *
  * Scale notes: per-partition batch processing keeps codec state (a real
  * decoder handle) initialized once per partition, not per row; frames
  * explode 1→n_frames, so downstream ops should repartition by doc_id only
  * if a shuffle is otherwise required — sampling itself is map-only.
  */
object Multimodal {

  /** A document with an opaque media payload. */
  final case class MediaDoc(doc_id: Long, media: Array[Byte])

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long, format: String)

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  /** Attach a binary media column (here: the UTF-8 bytes of `text` — the
    * corpus has no real media; the column type and all downstream plumbing
    * are what is being exercised). */
  def withMedia(documents: DataFrame): Dataset[MediaDoc] = {
    val sp = documents.sparkSession
    import sp.implicits._
    documents.select(col("doc_id"), col("text").cast("binary").as("media")).as[MediaDoc]
  }

  /** STUB DECODER — deterministic fake in place of a real codec. A real
    * implementation would parse the container header here; per-partition
    * iteration is where a codec handle would be opened once and reused. */
  def decodeMeta(docs: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.mapPartitions { it =>
      // real decoder initialization would happen here, once per partition
      it.map { d =>
        val b = d.media
        val n = b.length.toLong
        // total over ALL payloads: a media blob shorter than 3 bytes reads as
        // zero-padded (the oracle's ASCII('') is 0), instead of throwing and
        // failing the whole job on one short document
        def byteAt(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
        MediaMeta(
          d.doc_id,
          n_bytes = n,
          width = 64 + byteAt(0) % 64,
          height = 64 + byteAt(1) % 64,
          n_frames = 1 + n % 16,
          format = (byteAt(2) % 3) match {
            case 0 => "img"; case 1 => "vid"; case _ => "aud"
          })
      }
    }
  }

  /** STUB resize: keep every `step`-th byte of the payload (a real
    * implementation would decode, scale, re-encode). Byte-exact output is
    * oracle-verified via MD5 (MultimodalQueries.mmResize). */
  def resample(docs: Dataset[MediaDoc], step: Int = 2): Dataset[MediaDoc] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.mapPartitions { it =>
      it.map { d =>
        MediaDoc(d.doc_id, d.media.indices.collect {
          case i if i % step == 0 => d.media(i)
        }.toArray)
      }
    }
  }

  /** A perceptual hash of a media payload. */
  final case class MediaHash(doc_id: Long, ahash: Long, n_set: Long)

  /** Average-hash (aHash) over the payload's leading 63 bytes: bit i set
    * iff byte i exceeds the window's integer mean — the classic perceptual
    * near-dup fingerprint, computed here over the stub payload exactly as a
    * real implementation would compute it over decoded+downscaled pixels
    * (the decode is the stub; the hash math is the real algorithm). 63 bits
    * keeps the value positive in a signed 64-bit lane on every engine.
    * Short payloads zero-pad (same totality rule as decodeMeta). */
  def averageHash(docs: Dataset[MediaDoc]): Dataset[MediaHash] = {
    val sp = docs.sparkSession
    import sp.implicits._
    val Window = 63
    docs.mapPartitions { it =>
      it.map { d =>
        def byteAt(i: Int): Int = if (i < d.media.length) d.media(i) & 0xff else 0
        val bytes = Array.tabulate(Window)(byteAt)
        val mean = bytes.sum / Window
        var hash = 0L
        var set = 0L
        var i = 0
        while (i < Window) {
          if (bytes(i) > mean) { hash |= 1L << i; set += 1 }
          i += 1
        }
        MediaHash(d.doc_id, hash, set)
      }
    }
  }

  /** STUB frame sampler: every `step`-th frame as a 16-byte slice at a
    * deterministic offset. Real implementation: seek + decode keyframes. */
  def sampleFrames(docs: Dataset[MediaDoc], step: Int = 2): Dataset[Frame] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.flatMap { d =>
      val n = d.media.length
      val nFrames = 1 + n % 16
      val frameLen = math.min(16, n)
      (0 until nFrames by step).map { f =>
        val start = (f * 13) % (n - frameLen + 1)
        Frame(d.doc_id, f.toLong, d.media.slice(start, start + frameLen))
      }
    }
  }
}
