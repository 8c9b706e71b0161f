package graft.queries

import graft.functions.PortableHash.h48Sql
import graft.functions.TextFunctions

/** Sequence-packing catalog entries — [[graft.operators.SequencePacking]]
  * over the `documents` table, token counts from the shared subword estimate
  * (`txt_tokens`' n_subword_est), all doc-for-doc DuckDB-gated.
  *
  * Window lengths are sized to the corpus (docs run 12–152 est. tokens):
  * 256 for the chunk flavors (~3 docs/window) and 128 for greedy so the
  * truncation path (docs > seqLen) is exercised inside the gate, not just
  * in unit tests. A production run would pass 8192; the laws are
  * length-invariant.
  */
object PackingQueries {

  private val ChunkLen = 256L
  private val GreedyLen = 128L
  private val Shards = 16

  /** Oracle CTEs for the shared packing-order window over ANY
    * (doc_id, n_tok) relation: shard + pack hash + the within-shard prefix
    * sum (`cb` = tokens before this doc in its shard's concatenated
    * stream). Mirrors SequencePacking.keyed + packChunks' window
    * literal-for-literal; `pipeline_pack` reuses it over the curated
    * survivor set. */
  private[queries] def packWindowCtes(src: String): String =
    s"""k AS (SELECT doc_id, n_tok,
       |    ${h48Sql("'sh:' || CAST(doc_id AS VARCHAR)")} % $Shards AS shard,
       |    ${h48Sql("'pk:' || CAST(doc_id AS VARCHAR)")} AS pk
       |  FROM $src),
       |kk AS (SELECT * FROM k WHERE n_tok > 0),
       |w AS (SELECT doc_id, shard, pk, n_tok,
       |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY pk, doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS cb,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY pk, doc_id) AS BIGINT) AS pack_order
       |  FROM kk)""".stripMargin

  /** The per-sequence accounting SELECT over `w` (shared by
    * `corpus_pack_stats` and `pipeline_pack`; `len` = window capacity). */
  private[queries] def packStatsSql(len: Long): String =
    s"""x AS (SELECT shard, cb, n_tok,
       |    UNNEST(GENERATE_SERIES(cb // $len, (cb + n_tok - 1) // $len)) AS seq_id
       |  FROM w)
       |SELECT shard, CAST(seq_id AS BIGINT) AS seq_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN cb >= seq_id * $len THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_started,
       |  CAST(SUM(LEAST(cb + n_tok, (seq_id + 1) * $len)
       |    - GREATEST(cb, seq_id * $len)) AS BIGINT) AS n_tokens,
       |  SUM(LEAST(cb + n_tok, (seq_id + 1) * $len)
       |    - GREATEST(cb, seq_id * $len)) = $len AS is_full
       |FROM x GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin

  /** The next-fit recurrence as a recursive CTE over `w` (shared by
    * `corpus_pack_greedy` and `corpus_pack_manifest`): per-shard linear
    * recursion on pack_order carrying (seq_id, write position). */
  private def greedyRecCtes(len: Long): String =
    s"""r AS (SELECT doc_id, shard, LEAST(n_tok, $len) AS tu,
       |    n_tok > $len AS truncated, pack_order AS rn
       |  FROM w),
       |rec(shard, rn, doc_id, seq_id, tok_start, tokens_used, truncated) AS (
       |  SELECT shard, rn, doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), tu, truncated
       |  FROM r WHERE rn = 1
       |  UNION ALL
       |  SELECT n.shard, n.rn, n.doc_id,
       |    CASE WHEN p.tok_start + p.tokens_used + n.tu <= $len
       |      THEN p.seq_id ELSE p.seq_id + 1 END,
       |    CASE WHEN p.tok_start + p.tokens_used + n.tu <= $len
       |      THEN p.tok_start + p.tokens_used ELSE CAST(0 AS BIGINT) END,
       |    n.tu, n.truncated
       |  FROM rec p JOIN r n ON n.shard = p.shard AND n.rn = p.rn + 1)""".stripMargin

  /** Token estimate + window chain over the raw corpus (the standalone
    * corpus_pack_* entries). */
  private def packCtes: String =
    s"""d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
       |tok AS (SELECT doc_id, ${TextFunctions.subwordTokenEstSql("ws")} AS n_tok FROM d),
       |${packWindowCtes("tok")}""".stripMargin

  private def docsWithTok(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.functions._
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.subwordTokenEst(split(col("text"), " ")).as("n_tok"))
  }

  /** Concat-and-chunk placement (GPT-style packing where docs may span
    * window boundaries): each doc's (seq_first, seq_last, tok_offset) in
    * its shard's chunked token stream. */
  val packChunks = QuerySpec(
    "corpus_pack_chunks",
    "sequence packing: concat-and-chunk per-doc placement in fixed 256-token windows",
    Some(s"""WITH $packCtes
            |SELECT doc_id, shard, pack_order, n_tok,
            |  cb // $ChunkLen AS seq_first,
            |  (cb + n_tok - 1) // $ChunkLen AS seq_last,
            |  cb % $ChunkLen AS tok_offset
            |FROM w ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      graft.operators.SequencePacking
        .packChunks(docsWithTok(s, dir), "n_tok", ChunkLen, Shards)
        .orderBy("doc_id"))

  /** Per-sequence fill accounting over the chunk layout: docs overlapping /
    * starting in each window, token occupancy, fullness. */
  val packStats = QuerySpec(
    "corpus_pack_stats",
    "sequence packing: per-window doc membership + token fill accounting",
    Some(s"""WITH $packCtes,
            |${packStatsSql(ChunkLen)}""".stripMargin),
    (s, dir) =>
      graft.operators.SequencePacking
        .packStats(docsWithTok(s, dir), "n_tok", ChunkLen, Shards)
        .orderBy("shard", "seq_id"))

  /** Boundary-respecting next-fit (docs never split; oversize docs
    * truncated + flagged). The Spark side is the sorted streaming pass;
    * the oracle re-derives the same recurrence as a recursive CTE. */
  val packGreedy = QuerySpec(
    "corpus_pack_greedy",
    "sequence packing: boundary-respecting next-fit into 128-token windows (truncation flagged)",
    Some(s"""WITH RECURSIVE $packCtes,
            |${greedyRecCtes(GreedyLen)}
            |SELECT doc_id, shard, seq_id,
            |  CAST(ROW_NUMBER() OVER (PARTITION BY shard, seq_id ORDER BY rn) - 1 AS BIGINT) AS pos_in_seq,
            |  tok_start, tokens_used, truncated
            |FROM rec ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      graft.operators.SequencePacking
        .packGreedy(docsWithTok(s, dir), "n_tok", GreedyLen, Shards)
        .toDF()
        .orderBy("doc_id"))

  /** The packed-sequence manifest (what a dataloader reads): per window,
    * doc count + used tokens + canonical JSON membership — Spark builds it
    * through the engine's one sorted-entries map→JSON construction (the
    * heatmap-blob byte format); DuckDB assembles the identical bytes with
    * an ordered STRING_AGG, so the gate is byte-exact on the JSON. */
  val packManifest = QuerySpec(
    "corpus_pack_manifest",
    "sequence packing: per-window JSON membership manifest (dataloader artifact)",
    Some(s"""WITH RECURSIVE $packCtes,
            |${greedyRecCtes(GreedyLen)}
            |SELECT shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(tokens_used) AS BIGINT) AS tokens_used,
            |  '{' || STRING_AGG('"' || CAST(doc_id AS VARCHAR) || '":{"tok_start":'
            |    || CAST(tok_start AS VARCHAR) || ',"tokens_used":'
            |    || CAST(tokens_used AS VARCHAR) || '}', ',' ORDER BY doc_id) || '}' AS members
            |FROM rec GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin),
    (s, dir) =>
      graft.operators.SequencePacking
        .packManifest(docsWithTok(s, dir), "n_tok", GreedyLen, Shards)
        .orderBy("shard", "seq_id"))

  val all: Seq[QuerySpec] = Seq(packChunks, packStats, packGreedy,
    packManifest)
}
