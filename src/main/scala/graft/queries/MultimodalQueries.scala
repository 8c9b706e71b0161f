package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Oracle-checked queries over the multimodal plumbing (operators.Multimodal).
  *
  * The corpus text is ASCII, so byte arithmetic on the binary media column
  * equals character-code arithmetic on `text` — which lets the DuckDB oracle
  * independently reproduce the stub decoder's outputs and verify the whole
  * typed-Dataset mapPartitions/flatMap path end-to-end.
  */
object MultimodalQueries {

  /** Metadata extraction through binary → typed Dataset → mapPartitions. */
  val mmMeta = QuerySpec(
    "mm_meta",
    "binary media metadata decode (stubbed codec, real plumbing)",
    Some("""SELECT doc_id,
           |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           |  CAST(64 + ASCII(SUBSTR(text, 1, 1)) % 64 AS BIGINT) AS width,
           |  CAST(64 + ASCII(SUBSTR(text, 2, 1)) % 64 AS BIGINT) AS height,
           |  CAST(1 + LENGTH(text) % 16 AS BIGINT) AS n_frames,
           |  CASE ASCII(SUBSTR(text, 3, 1)) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'vid' ELSE 'aud' END AS format
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      Multimodal.decodeMeta(Multimodal.withMedia(Tables(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id"))

  /** Frame sampling fan-out: real byte slices, aggregated back per doc so
    * the oracle can verify counts/sizes arithmetically. */
  val mmFrames = QuerySpec(
    "mm_frames",
    "frame sampling over binary media (flatMap fan-out)",
    Some("""SELECT doc_id,
           |  CAST((1 + LENGTH(text) % 16 + 1) // 2 AS BIGINT) AS n_sampled,
           |  CAST(((1 + LENGTH(text) % 16 + 1) // 2) * LEAST(16, LENGTH(text)) AS BIGINT) AS total_frame_bytes
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      Multimodal.sampleFrames(Multimodal.withMedia(Tables(s, dir, "documents")))
        .toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("frame_bytes")).cast("long")).as("total_frame_bytes"))
        .orderBy("doc_id"))

  /** Resize (downsample) stub, verified BYTE-EXACTLY: the oracle rebuilds
    * the every-2nd-byte payload character-wise and MD5s it. */
  val mmResize = QuerySpec(
    "mm_resize",
    "media resize stub (byte downsample), md5-verified payloads",
    Some("""SELECT doc_id,
           |  CAST((LENGTH(text) + 1) // 2 AS BIGINT) AS resized_len,
           |  MD5(ARRAY_TO_STRING(LIST_TRANSFORM(
           |    GENERATE_SERIES(1, (LENGTH(text) + 1) // 2),
           |    i -> SUBSTR(text, 2 * i - 1, 1)), '')) AS resized_md5
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      Multimodal.resample(Multimodal.withMedia(Tables(s, dir, "documents")), step = 2)
        .toDF()
        .select(col("doc_id"),
          length(col("media")).cast("long").as("resized_len"),
          md5(col("media")).as("resized_md5"))
        .orderBy("doc_id"))

  /** Perceptual average-hash through the typed mapPartitions path: bit i of
    * the 63-bit hash is set iff payload byte i exceeds the leading-window
    * integer mean. The oracle re-derives every bit from character codes
    * (ASCII('') = 0 reproduces the zero-padding of short payloads).
    *
    * ASCII-corpus assumption (shared implicitly by mmMeta): the Spark side
    * hashes UTF-8 BYTES of the media payload while the oracle's
    * ASCII(SUBSTR(text, i, 1)) walks CODEPOINTS — the two views coincide
    * exactly when every character is single-byte ASCII, which TESTDATA.md's
    * generated corpus guarantees. Non-ASCII text would need the oracle
    * rewritten over an explicit byte view (e.g. indexing ENCODE(text)). */
  val mmPhash = QuerySpec(
    "mm_phash",
    "perceptual average-hash (63-bit) over binary media payloads",
    Some("""WITH b AS (SELECT doc_id,
           |    LIST_TRANSFORM(GENERATE_SERIES(1, 63), i -> ASCII(SUBSTR(text, i, 1))) AS bs
           |  FROM documents),
           |m AS (SELECT doc_id, bs, LIST_SUM(bs) // 63 AS mean FROM b)
           |SELECT doc_id,
           |  CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 63),
           |    i -> CASE WHEN bs[i] > mean THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS ahash,
           |  CAST(LEN(LIST_FILTER(bs, x -> x > mean)) AS BIGINT) AS n_set
           |FROM m ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      Multimodal.averageHash(Multimodal.withMedia(Tables(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id"))

  val all: Seq[QuerySpec] = Seq(mmMeta, mmFrames, mmResize, mmPhash)
}
