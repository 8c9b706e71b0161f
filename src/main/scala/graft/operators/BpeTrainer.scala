package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding tokenizer training (Sennrich et al. 2016) —
  * the full merge LOOP, not just first-iteration candidate mining
  * (`txt_bpe_pairs` is iteration 1 of this): N times, count adjacent token
  * pairs across the corpus, fuse the most frequent pair everywhere, repeat
  * on the re-tokenized words. Every public pretraining recipe trains one of
  * these once per vocabulary; this is the stage between a chars/4 token
  * ESTIMATE and real token counts.
  *
  * Scale shape — the two-level design every distributed BPE trainer uses:
  * the ONLY corpus-sized job is the initial word-frequency aggregation
  * (one scan, map-side combined, shuffling at most |vocab| rows); all N
  * merge iterations then run on the VOCAB table (distinct words × counts —
  * bounded by language, ~10⁵–10⁷ rows no matter how many TB of text), each
  * iteration one bounded pair-count aggregation (≤ |vocab|·avg_len pairs,
  * partial-aggregated to ≤ |alphabet+merges|² rows per partition before
  * the exchange) plus a 1-row TakeOrdered collect — the KMeans
  * literal-iteration pattern. The merge rewrite is a narrow per-row string
  * replace; 16 chained replaces on a vocab-bounded cached table cost
  * nothing, so iterations chain lineage instead of re-caching.
  *
  * Tokenized words are carried as WRAPPED STRINGS: word "abc" encodes as
  * `|a||b||c|`, every token flanked by `|` on both sides. Fusing pair
  * (l, r) is then the plain non-overlapping left-to-right string
  * replacement `|l||r|` → `|lr|`, which is EXACTLY greedy BPE merge
  * application — the flanking bars make a match impossible except at true
  * token boundaries (tokens are `[a-z]+` by pre-tokenization, never
  * containing `|`), and consecutive overlapping occurrences resolve
  * left-to-right exactly as the scan-and-skip definition does
  * (`|a||a||a||a|` → `|aa||aa|`, `|a||a||a|` → `|aa||a|`). Both engines'
  * REPLACE share these semantics, which is what makes the merge law
  * portable enough to sit under the DuckDB gate unrolled N deep.
  *
  * Pre-tokenization: lowercased `[a-z]+` runs (the word-boundary
  * normalization real BPE pre-tokenizers apply before merging; it also
  * guarantees the separator never collides with token content). Ties on
  * pair frequency break (count desc, left, right) — fully deterministic,
  * mirrored by the oracle.
  */
object BpeTrainer {

  /** One learned merge: `rank` is merge order (0 = first, most frequent),
    * `left`/`right` the fused tokens, `nOccurrences` the corpus-weighted
    * adjacent-pair count AT THE TIME of the merge (counts shrink as earlier
    * merges consume occurrences — the signature of a real iterative train,
    * and what distinguishes this from one-shot pair mining). */
  final case class Merge(rank: Int, left: String, right: String,
      nOccurrences: Long)

  /** Wrapped-token encoding of a raw word: every char becomes `|c|`. */
  def encodeWord(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(word, "(.)", "|$1|")

  /** @param wordFreq `(wordCol: string, nCol: long)` — DISTINCT words with
    *        corpus occurrence counts (the caller's one corpus-sized job)
    * @param merges number of merge iterations to learn
    * @param scope  cache owner for the vocab table */
  def train(wordFreq: DataFrame, wordCol: String, nCol: String, merges: Int,
      scope: CacheScope = CacheScope.Unmanaged): Seq[Merge] = {
    require(merges >= 1, s"need at least one merge iteration, got $merges")
    var wf = scope.track(wordFreq.select(
      encodeWord(col(wordCol)).as("enc"), col(nCol).cast("long").as("n")))
    val out = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < merges) {
      val toks = split(col("enc").substr(lit(2), length(col("enc")) - 2), "\\|\\|")
      val top = wf
        .select(toks.as("toks"), col("n"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS l, toks[i] AS r))")).as("pr"), col("n"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1) // TakeOrderedAndProject: 1 row per partition to the driver
        .collect()
      // fail loud on an exhausted corpus (every word fused to one token):
      // a silent partial merge table would diverge from a fixed-N oracle
      require(top.nonEmpty,
        s"BPE corpus exhausted after $rank merges; asked for $merges")
      val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += Merge(rank, l, r, cnt)
      wf = wf.withColumn("enc",
        replace(col("enc"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
      rank += 1
    }
    out.result()
  }
}
