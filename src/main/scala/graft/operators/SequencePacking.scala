package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Sequence packing — the output stage between budget/mixture selection and
  * an actual trainer: kept documents are packed into fixed-length training
  * sequences (the "8192-token window" a pretraining run consumes), with
  * per-sequence doc membership and fill-rate accounting. The reference's
  * blob-packaging stage (heatmap.py:120-129) is its "pack small things into
  * a training-unit container" ancestor; this is the corpus-scale descendant
  * every public curation recipe (GPT-style concat-and-chunk, boundary-
  * respecting packing) ships.
  *
  * Determinism contract: packing order is (shard, h48("pk:"+doc_id),
  * doc_id) — the same portable-hash law as the shard manifest — so the
  * layout is reproducible on any cluster, any partitioning, any engine, and
  * every flavor below is DuckDB-oracle-checkable doc-for-doc.
  *
  * Scale shape: packing is PER SHARD (the unit a real pipeline writes as one
  * output file), never global — a global concat order would be a
  * single-reducer sort at 100 TB. Each flavor costs exactly ONE hash
  * exchange on `shard` plus an in-partition sort; the greedy flavor then
  * streams with O(1) state. Fan-out in the stats flavor is bounded by
  * ⌈max doc len / seqLen⌉.
  *
  * Flavors:
  *   - [[packChunks]]: concat-and-chunk (doc may SPAN sequences) — per-doc
  *     placement via an integer prefix sum windowed within shard.
  *   - [[packStats]]: per-sequence accounting over the chunk layout
  *     (n_docs, token occupancy, fill).
  *   - [[packGreedy]]: boundary-respecting NEXT-FIT (docs never split; a
  *     doc that can't fit the remainder opens a new sequence; docs longer
  *     than seqLen are truncated and flagged) — a sequential recurrence, so
  *     it runs as a sorted streaming pass per shard, not a window.
  */
object SequencePacking {

  /** Shard + deterministic pack order, the shared prefix of every flavor:
    * (doc_id, n_tok, shard, pk) filtered to n_tok > 0 (a zero-token doc
    * occupies no window; both engines drop it explicitly). */
  private def keyed(docs: DataFrame, tokCol: String, shards: Int): DataFrame =
    docs
      .select(col("doc_id"), col(tokCol).cast("long").as("n_tok"),
        (PortableHash.h48(concat(lit("sh:"), col("doc_id").cast("string")))
          % shards).as("shard"),
        PortableHash.h48(concat(lit("pk:"), col("doc_id").cast("string")))
          .as("pk"))
      .filter(col("n_tok") > 0)

  /** Concat-and-chunk placement: within its shard's deterministic order,
    * each doc's tokens occupy the half-open range [cum_before,
    * cum_before + n_tok) of the shard's concatenated token stream, which
    * seqLen-chunking maps to sequences seq_first..seq_last with the doc
    * starting at tok_offset inside seq_first.
    *
    * Output: (doc_id, shard, pack_order, n_tok, seq_first, seq_last,
    * tok_offset). One exchange on shard; the window's prefix sum is
    * integer-exact. */
  def packChunks(docs: DataFrame, tokCol: String = "n_tok",
      seqLen: Long = 8192, shards: Int = 16): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    val w = Window.partitionBy("shard").orderBy(col("pk"), col("doc_id"))
    keyed(docs, tokCol, shards)
      .withColumn("cum_before",
        sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
          - col("n_tok"))
      .withColumn("pack_order", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_order"), col("n_tok"),
        // `div`, not `/`: Column./ is DOUBLE division, and a cast-truncated
        // double loses integer exactness once prefix sums pass 2^52
        expr(s"cum_before div ${seqLen}L").as("seq_first"),
        expr(s"(cum_before + n_tok - 1) div ${seqLen}L").as("seq_last"),
        (col("cum_before") % seqLen).as("tok_offset"))
  }

  /** Per-sequence accounting over the [[packChunks]] layout: for every
    * (shard, seq_id), the docs overlapping the window, the tokens it holds
    * (= seqLen except each shard's final window), and how many docs START
    * in it. Derived by exploding each doc's bounded seq range and clipping
    * its token interval to the window — map-side fan-out ≤
    * ⌈max doc len / seqLen⌉ + 1 rows per doc, then one bounded aggregation.
    *
    * Output: (shard, seq_id, n_docs, n_docs_started, n_tokens, is_full). */
  def packStats(docs: DataFrame, tokCol: String = "n_tok",
      seqLen: Long = 8192, shards: Int = 16): DataFrame = {
    val chunks = packChunks(docs, tokCol, seqLen, shards)
      .withColumn("cum_before",
        col("seq_first") * seqLen + col("tok_offset"))
    chunks
      .select(col("shard"), col("cum_before"), col("n_tok"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cum_before") >= col("seq_id") * seqLen, 1L)
          .otherwise(0L)).as("n_docs_started"),
        sum(least(col("cum_before") + col("n_tok"),
            (col("seq_id") + 1) * seqLen)
          - greatest(col("cum_before"), col("seq_id") * seqLen))
          .as("n_tokens"))
      .withColumn("is_full", col("n_tokens") === seqLen)
  }

  /** The packed-sequence MANIFEST a trainer's dataloader reads: one row per
    * (shard, seq_id) with doc count, used tokens, and the membership as
    * canonical JSON {doc_id: {tok_start, tokens_used}} — keys in numeric
    * doc order via the engine's one sorted-entries construction
    * (`array_sort(collect_list(struct))` → `map_from_entries` → `to_json`,
    * the same byte-format discipline as the heatmap blobs; the reference's
    * blob packaging, heatmap.py:120-129, is this stage's ancestor). Built
    * on the [[packGreedy]] layout (doc boundaries respected — what a
    * dataloader actually wants); one extra bounded aggregation over it. */
  def packManifest(docs: DataFrame, tokCol: String = "n_tok",
      seqLen: Long = 8192, shards: Int = 16): DataFrame = {
    packGreedy(docs, tokCol, seqLen, shards).toDF()
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens_used").as("tokens_used"),
        to_json(map_from_entries(transform(
          array_sort(collect_list(struct(col("doc_id"), col("tok_start"),
            col("tokens_used").as("used")))),
          e => struct(e.getField("doc_id").cast("string").as("key"),
            struct(e.getField("tok_start").as("tok_start"),
              e.getField("used").as("tokens_used")).as("value")))))
          .as("members"))
  }

  /** One packed doc in the [[packGreedy]] output. */
  final case class Packed(doc_id: Long, shard: Long, seq_id: Long,
      pos_in_seq: Long, tok_start: Long, tokens_used: Long,
      truncated: Boolean)


  /** Boundary-respecting NEXT-FIT packing: docs never split across
    * sequences — in shard order, a doc is placed at the current sequence's
    * write position if it fits, else it opens the next sequence; a doc
    * longer than seqLen is truncated to seqLen (occupying one full sequence
    * alone) and flagged. This is the sequential recurrence the window-based
    * flavors can't express, so it runs as the classic Spark shape for
    * ordered per-group streaming: ONE exchange co-locating each shard,
    * Spark's external sort within partitions, then a mapPartitions pass
    * holding O(1) state (seq index, write position) that resets at each
    * shard boundary — no group ever materializes in memory, unlike
    * groupByKey+flatMapGroups.
    *
    * Output: (doc_id, shard, seq_id, pos_in_seq, tok_start, tokens_used,
    * truncated); seq_id is per-shard, pos_in_seq the doc's 0-based slot in
    * its sequence. The DuckDB oracle re-derives the recurrence as a
    * recursive CTE. */
  def packGreedy(docs: DataFrame, tokCol: String = "n_tok",
      seqLen: Long = 8192, shards: Int = 16): Dataset[Packed] = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // tuple encoder, not a nested case class: Spark's codegen'd safe
    // projection can't access a private nested class
    keyed(docs, tokCol, shards)
      .select(col("doc_id"), col("n_tok"), col("shard"), col("pk"))
      .as[(Long, Long, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pk", "doc_id")
      .mapPartitions { it =>
        // streaming next-fit; state resets when the shard changes (several
        // shards may hash to one partition, each arriving contiguous)
        var shard = -1L
        var seq = 0L; var pos = 0L; var used = 0L
        it.map { case (docId, nTok, dShard, _) =>
          val tu = math.min(nTok, seqLen)
          if (dShard != shard) { shard = dShard; seq = 0L; pos = 0L; used = 0L }
          else if (used + tu > seqLen) { seq += 1L; pos = 0L; used = 0L }
          val out = Packed(docId, dShard, seq, pos, used, tu,
            truncated = nTok > seqLen)
          pos += 1L; used += tu
          out
        }
      }
  }
}
