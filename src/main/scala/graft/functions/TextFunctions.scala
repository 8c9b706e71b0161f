package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public text-pipeline scalar library: the building blocks of the curation
  * operators (quality scoring, contamination shingles), exposed at the
  * functions layer so library users can apply them to THEIR document tables
  * (see [[graft.operators.CorpusCuration]]), not only to the test corpus.
  *
  * Every function has a DuckDB SQL twin over a `ws` (word-list) column so the
  * query catalog's oracles stay byte-identical to the engine — the same
  * cross-engine determinism contract as [[PortableHash]].
  */
object TextFunctions {

  /** Whitespace tokenization of a text column. */
  def words(text: Column): Column = split(text, " ")

  /** The shared quality stoplist (and its SQL literal form). */
  val Stoplist: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")
  val StoplistSql: String = Stoplist.map(w => s"'$w'").mkString("(", ", ", ")")

  /** THE ANALYZER LAW — ONE definition of the normalized token stream a
    * real retrieval user's first query needs (the raw whitespace split
    * misses "Hash," and "HASH" for the query term "hash"): lowercase,
    * strip non-alphanumerics per token, drop empties and [[Stoplist]]
    * words. A document the chain empties keeps the `['']` convention of
    * the raw split (`words('') == ['']`), so every doc still emits ≥ 1
    * posting and the stats law stays structural. Per-row and
    * shuffle-free like [[words]]; the SQL twin below is the SAME chain
    * for the oracles that replay it. */
  def analyzedWords(text: Column): Column = {
    val cleaned = filter(
      transform(split(lower(text), " "),
        w => regexp_replace(w, "[^a-z0-9]", "")),
      w => w =!= "" && !w.isin(Stoplist: _*))
    when(size(cleaned) === 0, array(lit(""))).otherwise(cleaned)
  }

  /** DuckDB twin of [[analyzedWords]] (the Column+Sql pair convention). */
  def analyzedWordsSql(text: String): String = {
    val cleaned = s"LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT(LOWER($text), ' '), " +
      s"w -> REGEXP_REPLACE(w, '[^a-z0-9]', '', 'g')), " +
      s"w -> w <> '' AND w NOT IN $StoplistSql)"
    s"(CASE WHEN LEN($cleaned) = 0 THEN [''] ELSE $cleaned END)"
  }

  /** Quality score: floor(1000·(0.6·stopword_ratio + 0.4·min(1, n/50))).
    * Exact integer output from IEEE-deterministic single-row arithmetic. */
  def qualityScore(ws: Column): Column = {
    val stopCnt = size(filter(ws, w => w.isin(Stoplist: _*))).cast("long")
    val nTok = size(ws)
    floor(lit(1000.0) * (lit(0.6) * (stopCnt.cast("double") / nTok)
      + lit(0.4) * least(lit(1.0), nTok / lit(50.0))))
  }

  /** BPE-ish token estimate over a whitespace-word array: subword
    * vocabularies average ~4 chars/token, so Σ ceil(len/4) approximates the
    * tokenized length without a vocabulary — the budget number a
    * pretraining pipeline tracks per doc. (The double division is exact:
    * len+3 < 2^52.) */
  def subwordTokenEst(ws: Column): Column =
    aggregate(transform(ws, w => ((length(w) + lit(3)) / lit(4)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** DuckDB twin of [[subwordTokenEst]]. */
  def subwordTokenEstSql(ws: String): String =
    s"CAST(LIST_SUM(LIST_TRANSFORM($ws, w -> (LENGTH(w) + 3) // 4)) AS BIGINT)"

  /** floor(log2(x)) for integer x ≥ 1, computed EXACTLY on both engines as
    * (binary-digit count − 1) — no floating log whose last-ulp rounding
    * could flip a floor() at dyadic boundaries. This is the portable
    * surprisal/log-likelihood primitive behind the LM-quality and
    * importance-weighting operators: for x ≥ 1, floor(log2 x) equals
    * length(bin(floor x)) − 1 because floor preserves the dyadic interval
    * [2^k, 2^(k+1)). Spark renders binary via `conv(x, 10, 2)`, DuckDB via
    * `BIN(x)`; both emit no leading zeros. Input 0 or negative is a caller
    * bug (conv would yield wrapped 64-bit strings), so sites must guarantee
    * x ≥ 1 structurally (count ratios N div c with c ≤ N do). */
  def intLog2(x: Column): Column =
    (length(conv(x, 10, 2)) - 1).cast("long")

  /** DuckDB twin of [[intLog2]]. */
  def intLog2Sql(x: String): String =
    s"CAST(LENGTH(BIN(CAST($x AS BIGINT))) - 1 AS BIGINT)"

  /** The train/val/test split-assignment law — ONE definition (Column + SQL
    * twin) for every site that assigns splits (the curation manifest,
    * txt_sample_split, stream_corpus_ingest, and their oracles), so the
    * salt and the 80/10/10 thresholds cannot drift between the batch,
    * streaming, and oracle copies of the law. A doc's split NEVER changes
    * as the corpus around it grows (hash of the doc id alone). */
  val DefaultTrainPct: Int = 80
  val DefaultValPct: Int = 10
  val DefaultSplitSalt: String = "s2"

  /** h48(salt:doc_id) % 100 — the deterministic percent-bucket hash behind
    * split assignment AND rate sampling (txt_sample_split's s1 salt). */
  def splitHash(docId: Column, salt: String = DefaultSplitSalt): Column =
    PortableHash.h48(concat(lit(s"$salt:"), docId.cast("string"))) % 100

  /** DuckDB twin of [[splitHash]]. */
  def splitHashSql(docId: String, salt: String = DefaultSplitSalt): String =
    s"${PortableHash.h48Sql(s"'$salt:' || CAST($docId AS VARCHAR)")} % 100"

  /** The threshold law over [[splitHash]]'s output. */
  def splitAssign(hs: Column, trainPct: Int = DefaultTrainPct,
      valPct: Int = DefaultValPct): Column =
    when(hs < trainPct, "train")
      .when(hs < trainPct + valPct, "val")
      .otherwise("test")

  /** DuckDB twin of [[splitAssign]]. */
  def splitAssignSql(hs: String, trainPct: Int = DefaultTrainPct,
      valPct: Int = DefaultValPct): String =
    s"CASE WHEN $hs < $trainPct THEN 'train' " +
      s"WHEN $hs < ${trainPct + valPct} THEN 'val' ELSE 'test' END"

  /** DuckDB twin of [[qualityScore]]. */
  def qualityScoreSql: String =
    s"CAST(FLOOR(1000.0 * (0.6 * (CAST(LEN(LIST_FILTER(ws, w -> w IN $StoplistSql)) AS DOUBLE) / LEN(ws)) " +
      "+ 0.4 * LEAST(1.0, LEN(ws) / 50.0))) AS BIGINT)"

  /** PII regex library — the C4/RefinedWeb/Dolma-class screening pass every
    * production curation pipeline runs alongside quality/contamination.
    * Patterns are written in the COMMON SUBSET of Java regex (Spark) and
    * RE2 (DuckDB): no lookaround, no backreferences, `\b`/`\d`/classes
    * only, so both engines find the identical match set and the counts +
    * redaction are oracle-checkable. A production deployment would extend
    * the set (SSNs, IBANs, street addresses) under the same contract. */
  val PiiEmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val PiiIpRe: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Exact per-kind PII hit counts: (emails, phones, IPv4s). Counting uses
    * group-0 extraction so patterns need no capture groups. */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(PiiEmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PiiPhoneRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PiiIpRe), lit(0))).cast("long"))

  /** DuckDB twins of [[piiCounts]] (RE2 'g'-free extract-all counts). */
  def piiCountsSql(text: String): (String, String, String) = (
    s"CAST(LEN(REGEXP_EXTRACT_ALL($text, '$PiiEmailRe')) AS BIGINT)",
    s"CAST(LEN(REGEXP_EXTRACT_ALL($text, '$PiiPhoneRe')) AS BIGINT)",
    s"CAST(LEN(REGEXP_EXTRACT_ALL($text, '$PiiIpRe')) AS BIGINT)")

  /** Redacted text: every PII span replaced by a typed placeholder, applied
    * email → phone → IP (the placeholders contain no digits or `@`, so a
    * later pattern can never match inside an earlier replacement — the
    * order is part of the law and mirrored in SQL). */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "<EMAIL>"),
        PiiPhoneRe, "<PHONE>"),
      PiiIpRe, "<IP>")

  /** DuckDB twin of [[piiRedact]] ('g' = global, matching Spark's
    * replace-all default). */
  def piiRedactSql(text: String): String =
    s"REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE($text, " +
      s"'$PiiEmailRe', '<EMAIL>', 'g'), '$PiiPhoneRe', '<PHONE>', 'g'), " +
      s"'$PiiIpRe', '<IP>', 'g')"

  /** Distinct word k-grams (contamination shingles), guarded for <k-word
    * docs. ONE definition parameterized on k: the C4-family 5-gram screen
    * (gram5) and the GPT-3/PaLM-family 13-gram law (Brown et al. 2020 §C
    * removes training docs sharing any 13-gram with an eval set) are the
    * two public instantiations — a constant apart, never two laws. */
  def gramK(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      array_distinct(transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word 5-grams (contamination shingles). Guarded for <5-word
    * docs. */
  def gram5(ws: Column): Column = gramK(ws, 5)

  /** DuckDB twin of [[gramK]]. */
  def gramKSql(k: Int): String =
    s"CASE WHEN LEN(ws) >= $k THEN LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ws) - ${k - 1}), " +
      s"i -> ${(0 until k).map(j => s"ws[i+$j]").mkString(" || ' ' || ")})) ELSE [] END"

  /** DuckDB twin of [[gram5]]. */
  val gram5Sql: String = gramKSql(5)
}
