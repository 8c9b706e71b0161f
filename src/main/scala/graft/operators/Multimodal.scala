package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed partition-wise through typed Datasets.
  *
  * The payload is a REAL self-describing raster (no external codecs needed):
  *
  * {{{
  *   bytes 0-1   magic 'G','8'
  *   byte  2     width  (gray8 pixels per row)
  *   byte  3     height (rows per frame)
  *   byte  4     n_frames
  *   byte  5     format code (0=img, 1=vid, 2=aud)
  *   bytes 6..   n_frames * width * height pixel bytes, frame-major
  * }}}
  *
  * [[decode]] genuinely parses header + pixels from the binary column, and
  * resize / perceptual-hash / frame-sampling all operate on DECODED pixels
  * — the same shape a jpeg/mp4 pipeline has, minus the entropy coding. The
  * corpus has no real media, so [[withMedia]] SYNTHESIZES a raster per doc
  * from integer columns (doc_id, n_chars) with a closed-form pixel formula;
  * the DuckDB oracle recomputes every downstream answer from that closed
  * form WITHOUT parsing binary, which makes the whole decode→process path
  * independently verifiable (MultimodalQueries).
  *
  * Malformed payloads never throw (the reference's tile.py returns None on a
  * malformed tile id — same philosophy, tile.py:35-36): [[decodeMeta]] tags
  * them `bad` with zeroed dimensions, [[sampleFrames]] emits no frames,
  * [[resample]] passes them through unchanged.
  *
  * Scale notes: per-partition batch processing keeps codec state initialized
  * once per partition, not per row; frames explode 1→n_frames, so downstream
  * ops should repartition by doc_id only if a shuffle is otherwise required
  * — sampling itself is map-only.
  */
object Multimodal {

  /** A document with an opaque media payload. */
  final case class MediaDoc(doc_id: Long, media: Array[Byte])

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long, format: String)

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  /** A decoded raster: header fields + the raw pixel array (frame-major). */
  final case class Raster(doc_id: Long, width: Int, height: Int,
      nFrames: Int, fmtCode: Int, pixels: Array[Byte]) {
    def format: String = formatName(fmtCode)
    def frame(f: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(pixels, f * width * height, (f + 1) * width * height)
  }

  private val HeaderLen = 6

  def formatName(code: Int): String = code match {
    case 0 => "img"; case 1 => "vid"; case _ => "aud"
  }

  /** Serialize a raster to the binary payload format. */
  def encode(docId: Long, w: Int, h: Int, nFrames: Int, fmtCode: Int,
      pixels: Array[Byte]): MediaDoc = {
    require(pixels.length == nFrames * w * h,
      s"pixel buffer ${pixels.length} != $nFrames*$w*$h")
    require(w > 0 && w < 256 && h > 0 && h < 256 && nFrames > 0 && nFrames < 256
      && fmtCode >= 0 && fmtCode <= 2, s"header field out of byte range")
    val out = new Array[Byte](HeaderLen + pixels.length)
    out(0) = 'G'; out(1) = '8'
    out(2) = w.toByte; out(3) = h.toByte; out(4) = nFrames.toByte; out(5) = fmtCode.toByte
    System.arraycopy(pixels, 0, out, HeaderLen, pixels.length)
    MediaDoc(docId, out)
  }

  /** Parse a payload; None on bad magic, bad format code, or a pixel buffer
    * that does not match the declared dimensions. Total — never throws. */
  def decode(d: MediaDoc): Option[Raster] = {
    val b = d.media
    if (b.length < HeaderLen || b(0) != 'G' || b(1) != '8') None
    else {
      val w = b(2) & 0xff; val h = b(3) & 0xff
      val nf = b(4) & 0xff; val fc = b(5) & 0xff
      if (fc > 2 || w == 0 || h == 0 || nf == 0 ||
        b.length != HeaderLen + nf * w * h) None
      else Some(Raster(d.doc_id, w, h, nf,
        fc, java.util.Arrays.copyOfRange(b, HeaderLen, b.length)))
    }
  }

  /** Position-weighted integer checksum over a byte buffer:
    * Σ byte(i)·(i+1), the order-sensitive fingerprint the oracle recomputes
    * arithmetically (an unweighted sum would miss pixel permutations). */
  def checksum(bytes: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
    s
  }

  /** Synthesize a raster payload per document from integer columns — the
    * corpus stand-in for real media ingestion. Dimensions and pixels are
    * closed-form in (doc_id, n_chars) so the DuckDB oracle can predict every
    * decoded answer without touching binary:
    * w = 8 + doc_id%9, h = 8 + n_chars%9, frames = 1 + doc_id%4,
    * format = doc_id%3, pixel(k) = (doc_id·7 + k·31) mod 251. */
  def withMedia(documents: DataFrame): Dataset[MediaDoc] = {
    val sp = documents.sparkSession
    import sp.implicits._
    documents.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = (8 + id % 9).toInt
        val h = (8 + nChars % 9).toInt
        val nf = (1 + id % 4).toInt
        val pixels = Array.tabulate(nf * w * h)(k => ((id * 7 + k.toLong * 31) % 251).toByte)
        encode(id, w, h, nf, (id % 3).toInt, pixels)
      }
  }

  /** Header decode through the typed mapPartitions path (where a real codec
    * handle would be opened once per partition). Malformed → `bad`/zeros. */
  def decodeMeta(docs: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.mapPartitions { it =>
      // real decoder initialization would happen here, once per partition
      it.map { d =>
        decode(d) match {
          case Some(r) => MediaMeta(d.doc_id, d.media.length.toLong,
            r.width.toLong, r.height.toLong, r.nFrames.toLong, r.format)
          case None => MediaMeta(d.doc_id, d.media.length.toLong, 0L, 0L, 0L, "bad")
        }
      }
    }
  }

  /** Real nearest-neighbor downscale of frame 0: keep every `step`-th pixel
    * in both axes, re-encode as a 1-frame raster with the same format code.
    * Malformed payloads pass through unchanged. */
  def resample(docs: Dataset[MediaDoc], step: Int = 2): Dataset[MediaDoc] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.mapPartitions { it =>
      it.map { d =>
        decode(d) match {
          case Some(r) =>
            val w2 = (r.width + step - 1) / step
            val h2 = (r.height + step - 1) / step
            val f0 = r.frame(0)
            val px = new Array[Byte](w2 * h2)
            var y = 0
            while (y < h2) {
              var x = 0
              while (x < w2) {
                px(y * w2 + x) = f0(y * step * r.width + x * step)
                x += 1
              }
              y += 1
            }
            encode(d.doc_id, w2, h2, 1, r.fmtCode, px)
          case None => d
        }
      }
    }
  }

  /** A perceptual hash of a media payload. */
  final case class MediaHash(doc_id: Long, ahash: Long, n_set: Long)

  /** Average-hash (aHash) over the DECODED frame-0 pixels: bit i set iff
    * pixel i exceeds the 63-pixel window's integer mean — the classic
    * perceptual near-dup fingerprint (real aHash downscales to 8x8 first;
    * the synthetic rasters are already ≥ 8x8, so the window IS the
    * downscale). 63 bits keeps the value positive in a signed 64-bit lane
    * on every engine. Short/malformed payloads zero-pad. */
  def averageHash(docs: Dataset[MediaDoc]): Dataset[MediaHash] = {
    val sp = docs.sparkSession
    import sp.implicits._
    val Window = 63
    docs.mapPartitions { it =>
      it.map { d =>
        val px = decode(d).map(_.pixels).getOrElse(Array.empty[Byte])
        def pixAt(i: Int): Int = if (i < px.length) px(i) & 0xff else 0
        val bytes = Array.tabulate(Window)(pixAt)
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

  /** A document's image-tower embedding in the shared retrieval space. */
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** STUB IMAGE ENCODER — deterministic feature extraction over DECODED
    * frame-0 pixels, standing in for a trained image tower (this
    * container ships no vision model; the Spark-side plumbing — the real
    * header+pixel decode, the per-partition typed map where model
    * weights would load once, the embedding schema and everything
    * downstream of it — is real and gate-verified). Component j cycles
    * the frame-0 pixel buffer and centers it,
    * e[j] = pixel(j mod w·h) − 125, giving a mixed-sign vector the
    * cosine laws can normalize; every component is a small exact
    * integer, so float→double→normalize is bit-stable across engines.
    * Malformed payloads embed as nothing (flatMap drops them — a real
    * encoder's decode-failure path). */
  def imageEmbedding(docs: Dataset[MediaDoc], dim: Int): Dataset[MediaEmbedding] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.mapPartitions { it =>
      // a real encoder would load its weights here, once per partition
      it.flatMap { d =>
        decode(d).map { r =>
          val f0 = r.frame(0)
          MediaEmbedding(d.doc_id, Array.tabulate(dim)(j =>
            ((f0(j % f0.length) & 0xff) - 125).toFloat))
        }
      }
    }
  }

  /** Every `step`-th decoded frame as real pixel slices (a video pipeline's
    * keyframe sample). Malformed payloads emit no frames. */
  def sampleFrames(docs: Dataset[MediaDoc], step: Int = 2): Dataset[Frame] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.flatMap { d =>
      decode(d) match {
        case Some(r) =>
          (0 until r.nFrames by step).map(f => Frame(d.doc_id, f.toLong, r.frame(f)))
        case None => Seq.empty
      }
    }
  }
}
