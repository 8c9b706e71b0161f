package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.functions.PortableHash.{h48Sql, P}
import graft.operators.CacheScope

/** Deduplication operators over `documents` — exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. Every variant is oracle-checked end-to-end (including
  * MinHash signatures and LSH candidate pairs) thanks to the portable 48-bit
  * hash (PortableHash).
  *
  * Scale design (100 TB):
  *   - exact/set-key dedup: one hash-partitioned aggregation on the digest —
  *     the only shuffle moves 16-byte keys, not documents;
  *   - MinHash-LSH: signatures are a linear map-side pass; the band
  *     explode(×4) then self-join on (band, key) is the classic
  *     candidate-generation shuffle — buckets are tiny by construction, and
  *     the quadratic work happens only within buckets (never all-pairs);
  *   - n-gram Jaccard runs on a blocking key (`source` here) AND drops
  *     shingles with document frequency > [[DedupQueries.MaxShingleDf]]
  *     before the self-join, so a boilerplate shingle shared by D docs can
  *     never emit D² join rows — the all-pairs form is intentionally not
  *     expressible with this API shape;
  *   - SimHash: explode(words)×16 bits then two hash aggregations; at scale
  *     the bit dimension folds into a single VECTOR-style agg, the semantics
  *     stay identical.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def words: Column = split(col("text"), " ")

  /** The normalized word-set digest — ONE Spark definition shared by
    * `dedup_exact`, `dedup_source_stats`, and the dedup-aware mixture
    * derivation, so every consumer counts exactly the duplicate relation
    * the dedup pass removes (the oracle twins inline the same
    * MD5-of-sorted-distinct-words expression). */
  private[queries] def setKey: Column =
    md5(concat_ws(" ", array_sort(array_distinct(words))))

  /** DuckDB twin of [[setKey]] — the Column+Sql pair convention, so the
    * four oracles that embed the law interpolate ONE string. */
  private[queries] val setKeySql: String =
    "MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ' '))"

  // shingle builder, MinHash permutation constants, and candidate generation
  // live in the PUBLIC operator (graft.operators.MinHashLSH) so library
  // users can run them on their own tables; the oracle builders below
  // reconstruct the same permutations from the same constants
  import graft.operators.MinHashLSH.{A, B, K, shingles, shinglesSql}

  /** Exact dedup on two digests: raw text MD5 and a normalized "word set"
    * key (sorted distinct words) that catches reordered near-dups. */
  val dedupExact = QuerySpec(
    "dedup_exact",
    "exact + normalized-set hash dedup with canonical selection",
    Some(s"""WITH t AS (
           |  SELECT doc_id, MD5(text) AS text_md5,
           |    $setKeySql AS set_key
           |  FROM documents)
           |SELECT doc_id, text_md5, set_key,
           |  CAST(COUNT(*) OVER (PARTITION BY set_key) AS BIGINT) AS n_copies,
           |  CAST(MIN(doc_id) OVER (PARTITION BY set_key) AS BIGINT) AS canonical_id,
           |  doc_id = MIN(doc_id) OVER (PARTITION BY set_key) AS is_canonical
           |FROM t ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("set_key")
      docs(s, dir)
        .select(col("doc_id"),
          md5(col("text")).as("text_md5"),
          setKey.as("set_key"))
        .select(col("doc_id"), col("text_md5"), col("set_key"),
          count(lit(1)).over(w).as("n_copies"),
          min(col("doc_id")).over(w).as("canonical_id"),
          (col("doc_id") === min(col("doc_id")).over(w)).as("is_canonical"))
        .orderBy("doc_id")
    })

  /** PER-SOURCE DUPLICATION DIAGNOSTICS — the curation dashboard table a
    * team reads before deciding WHERE to spend dedup effort (and which
    * domains to down-weight at mixture time): each document keyed by
    * `dedup_exact`'s normalized word-set digest, a doc counted as
    * removable duplicate mass when it is not its group's canonical
    * (min doc_id), aggregated per source with an exact permille rate.
    * Boilerplate-heavy domains light up here long before a global dedup
    * rate moves — the Lee et al. 2022 ("Deduplicating Training Data…")
    * observation that duplication concentrates by source.
    *
    * Scale shape: ONE digest-keyed shuffle (the window over 16-byte
    * `unhex(md5)` binary digests — the round-12 width law), then a
    * map-side-combinable aggregation into ≤|sources| rows; documents
    * never shuffle, digests do. */
  val dedupSourceStats = QuerySpec(
    "dedup_source_stats",
    "per-source duplicate-mass diagnostics: removable-dup counts + permille by the shared set-key law",
    Some(s"""WITH t AS (
           |  SELECT doc_id, source,
           |    $setKeySql AS set_key
           |  FROM documents),
           |j AS (SELECT source,
           |    doc_id <> MIN(doc_id) OVER (PARTITION BY set_key) AS is_dup FROM t)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           |  (1000 * CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS dup_permille
           |FROM j GROUP BY source ORDER BY source""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("dg")
      docs(s, dir)
        .select(col("doc_id"), col("source"), unhex(setKey).as("dg"))
        .select(col("source"),
          (col("doc_id") =!= min(col("doc_id")).over(w)).as("is_dup"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          expr("(1000 * n_dup_docs) div n_docs").as("dup_permille"))
        .orderBy("source")
    })

  /** (signatures, banded candidate pairs) — shared by dedup_minhash_lsh and
    * dedup_clusters; delegates to the public operator. */
  private[queries] def minhashParts(s: SparkSession, dir: String,
      scope: CacheScope = CacheScope.Unmanaged): (DataFrame, DataFrame) =
    graft.operators.MinHashLSH.signaturesAndPairs(docs(s, dir), scope = scope)

  private def mkMinhashSpark(s: SparkSession, dir: String,
      scope: CacheScope): DataFrame = {
    val (sigs, pairs) = minhashParts(s, dir, scope)
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("long").as("est_matches"))
      .orderBy("doc_a", "doc_b")
  }

  /** The CTE chain up to LSH candidate `pairs` — shared by the MinHash
    * oracle and the cluster-resolution oracle. */
  private[queries] def minhashPairsCtes: String = minhashPairsCtes("documents")

  /** `from` variant: the relation the corpus text is read from (a planted
    * subquery for the PII manifest entry; `documents` everywhere else —
    * the no-arg form above stays byte-identical so existing oracles cannot
    * drift). `p` namespaces every CTE name (`${p}pairs`, ...) so TWO
    * independent chains can coexist in one statement (the corpus-diff
    * oracle instantiates yesterday's and today's corpus side by side);
    * the default "" keeps all single-chain oracles byte-identical. */
  private[queries] def minhashPairsCtes(from: String, p: String = ""): String = {
    val sigExprs = (0 until K).map(j =>
      s"LIST_MIN(LIST_TRANSFORM(hl, h -> (${A(j)} * h + ${B(j)}) % $P))").mkString("[", ", ", "]")
    s"""${p}t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM $from),
       |${p}sh AS (SELECT doc_id, $shinglesSql AS sl FROM ${p}t),
       |${p}hs AS (SELECT doc_id, LIST_TRANSFORM(sl, s -> ${h48Sql("s")} % $P) AS hl
       |       FROM ${p}sh WHERE LEN(sl) > 0),
       |${p}sig AS (SELECT doc_id, $sigExprs AS sig FROM ${p}hs),
       |${p}bands AS (SELECT doc_id, j,
       |    CAST(sig[2*j-1] AS VARCHAR) || '_' || CAST(sig[2*j] AS VARCHAR) AS k
       |  FROM ${p}sig CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, ${K / 2})) AS j)),
       |${p}pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared_bands
       |  FROM ${p}bands a JOIN ${p}bands b ON a.j = b.j AND a.k = b.k AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  private def mkMinhashOracle: String =
    s"""WITH $minhashPairsCtes
       |SELECT p.doc_a, p.doc_b, p.n_shared_bands,
       |  CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, $K), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS est_matches
       |FROM pairs p
       |JOIN sig sa ON sa.doc_id = p.doc_a
       |JOIN sig sb ON sb.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash (K=8) + LSH banding (4 bands × rows of 2): candidate near-dup
    * pairs with their signature-agreement estimate. Catches the corpus's
    * planted ~0.99-Jaccard near-dups while random pairs (j≈0.002) collide
    * with probability ≈ 4j² ≈ 0. */
  val dedupMinhash = QuerySpec(
    "dedup_minhash_lsh",
    "MinHash signatures + LSH banding candidate pairs",
    Some(mkMinhashOracle),
    mkMinhashSpark _)

  /** 16-bit SimHash over word hashes (with multiplicity): the
    * hamming-proximity fingerprint family. */
  val dedupSimhash = QuerySpec(
    "dedup_simhash",
    "SimHash document fingerprint (16-bit, word-level)",
    Some(s"""WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
            |h AS (SELECT doc_id, ${h48Sql("w")} AS h FROM w),
            |hb AS (SELECT doc_id, h, UNNEST(GENERATE_SERIES(0, 15)) AS b FROM h),
            |c AS (SELECT doc_id, b,
            |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
            |  FROM hb GROUP BY 1, 2)
            |SELECT doc_id,
            |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
            |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(words).as("w"))
        .select(col("doc_id"), PortableHash.h48(col("w")).as("h"))
        .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(15))).as("b"))
        .groupBy("doc_id", "b")
        .agg(sum(when(call_function("shiftright", col("h"), col("b")).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as("s"))
        .groupBy("doc_id")
        .agg(sum(when(col("s") > 0, call_function("shiftleft", lit(1L), col("b")))
          .otherwise(0L)).as("simhash"))
        .orderBy("doc_id"))

  /** FLOOR of the within-source document frequency a shingle may have and
    * still participate in n-gram-Jaccard pair generation. A shingle shared
    * by D documents emits D² join rows — boilerplate ("all rights
    * reserved") shared by 10⁶ docs would emit 10¹² intermediate rows at
    * corpus scale — so C4/RefinedWeb-style pipelines drop ubiquitous
    * shingles before pairing. Jaccard is then EXACT over the capped shingle
    * universe, and per-key join fan-out is bounded by τ² by construction. */
  val MaxShingleDf: Long = 50L

  /** Corpus-size-derived shingle cap: τ = max([[MaxShingleDf]], ⌊√n⌋) for a
    * source of n documents — the `planeCountFor`/`kFor` scale rule applied
    * to the df cap. √n is the principled scaling: any single shingle's join
    * fan-out is ≤ τ² ≤ n, so the worst boilerplate key contributes at most
    * LINEAR-in-corpus pairs at every scale, while the cap itself loosens as
    * the corpus grows (at 10⁹ docs a df-100 shingle is frequency 10⁻⁷ —
    * rare text, not boilerplate; a constant τ=50 would wrongly drop it,
    * and τ=⌊√10⁹⌋=31622 keeps it). The 50 floor keeps small corpora — both
    * sf gates (25/250 docs per source) and the planted 1000-doc fixture —
    * on round-5 behavior, pinning the static oracle SQL. */
  def maxShingleDfFor(nSrcDocs: Long): Long =
    math.max(MaxShingleDf, math.floor(math.sqrt(math.max(0L, nSrcDocs).toDouble)).toLong)

  /** Sentinel for [[ngramJaccardPairs]]'s maxDf: derive τ per source via
    * [[maxShingleDfFor]] instead of applying one uniform cap. */
  val DerivedDf: Long = -1L

  /** Frequency-capped n-gram Jaccard pair generation over a
    * (doc_id, source, text) frame — factored out so the planted-skew spec
    * can drive it directly. Sizes, intersections, and the jac_x1000 ratio
    * are all computed over the surviving (df ≤ maxDf) shingles.
    *
    * Cap plan shape: the hot-shingle set is found with a hash AGGREGATION
    * (map-side partials shrink the exchange to distinct (source, shingle)
    * counts) and removed with a size-guarded broadcast ANTI join — a
    * map-side filter over the cached exploded table. A window-df
    * formulation was measured first: it shuffles AND sorts the ENTIRE
    * exploded shingle table (1.84s vs 1.60s at sf0.1 — modest locally
    * because the pair join dominates at this scale, but at 100 TB the
    * full-data sort is the difference between the cap being free and
    * being the bottleneck). If boilerplate were so pervasive that
    * the hot set outgrew the broadcast guard, the anti join degrades to a
    * shuffled hash join — still sort-free, still exact. */
  private[graft] def ngramJaccardPairs(docSrc: DataFrame, maxDf: Long = DerivedDf,
      scope: CacheScope = CacheScope.Unmanaged): DataFrame = {
    // shingles are distinct per doc, so count() per (source, s) IS the
    // within-source document frequency; persisted because the exploded
    // table feeds the df aggregation, the size lookup, and both self-join
    // branches
    val ex = scope.track(docSrc
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("source"), explode(shingles(col("ws"))).as("s")))
    val dfBySrc = ex.groupBy("source", "s").agg(count(lit(1)).as("df"))
    val hot =
      if (maxDf >= 0) dfBySrc.filter(col("df") > maxDf).select("source", "s")
      else {
        // per-source τ = maxShingleDfFor(n_docs): one row per source
        // (size-guarded — sources can number in the millions at web scale),
        // joined into the df table so the cap scales with each source
        // independently; floor(sqrt(double)) is IEEE-identical in DuckDB
        val tau = docSrc.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .select(col("source"),
            greatest(lit(MaxShingleDf), floor(sqrt(col("n_docs"))).cast("long")).as("tau"))
        dfBySrc.join(Broadcasting.maybeBroadcast(tau), "source")
          .filter(col("df") > col("tau")).select("source", "s")
      }
    val kept = ex.join(Broadcasting.maybeBroadcast(hot), Seq("source", "s"), "left_anti")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.select(col("source"), col("s"), col("doc_id").as("doc_a"))
      .join(kept.select(col("source").as("source2"), col("s").as("s2"), col("doc_id").as("doc_b")),
        col("source") === col("source2") && col("s") === col("s2") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("na"), col("nb"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        expr("(1000 * n_inter) div (na + nb - n_inter)").as("jac_x1000"))
  }

  /** Exact n-gram Jaccard on candidate pairs within a blocking key
    * (`source`): the verify stage that follows LSH candidate generation.
    * Shingles with within-source document frequency > τ are dropped BEFORE
    * the self-join (see [[ngramJaccardPairs]]) — the hot-shingle cap that
    * keeps pair generation linear under boilerplate skew, with τ DERIVED
    * per source ([[maxShingleDfFor]]: max(50, ⌊√n_docs⌋)) so the cap
    * loosens as a source grows instead of staying constant-lossy. Both sf
    * gates sit on the 50 floor, so outputs are pinned to the constant-τ
    * rounds. jac_x1000 uses exact integer division — no float compare. */
  val dedupNgramJaccard = QuerySpec(
    "dedup_ngram_jaccard",
    "word-3-gram Jaccard similarity for same-source pairs (df-capped shingles)",
    Some(s"""WITH t AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sh AS (SELECT doc_id, source, UNNEST($shinglesSql) AS s FROM t),
            |tau AS (SELECT source, GREATEST($MaxShingleDf,
            |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS tau
            |  FROM documents GROUP BY source),
            |kept AS (SELECT doc_id, source, s FROM
            |  (SELECT doc_id, source, s, COUNT(*) OVER (PARTITION BY source, s) AS df FROM sh)
            |  JOIN tau USING (source) WHERE df <= tau),
            |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY 1),
            |ix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
            |  FROM kept a JOIN kept b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_a, doc_b, n_inter,
            |  sa.n + sb.n - n_inter AS n_union,
            |  (1000 * n_inter) // (sa.n + sb.n - n_inter) AS jac_x1000
            |FROM ix JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, dir, scope) => ngramJaccardPairs(docs(s, dir), scope = scope)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        col("jac_x1000"))
      .orderBy("doc_a", "doc_b"))

  /** CONTAINMENT on the same capped-shingle pairs — the asymmetric measure
    * Jaccard structurally misses: a short doc pasted whole inside a long
    * one has high containment (n_inter / min(na, nb) → 1) but LOW Jaccard
    * (the union is dominated by the long doc), so a Jaccard-thresholded
    * dedup keeps both copies. Broder's resemblance-vs-containment
    * distinction; quote-inclusion and template-wrapping are the production
    * cases. Same pair machinery, same τ cap, one extra integer division —
    * the subset flag fires at 90% containment where Jaccard stays under
    * 90%, isolating exactly the pairs the symmetric measure would pass.
    * The corpus plants whole-doc near-dups, not partial inclusions, so
    * the flag is false at both sf gates while every containment value is
    * still hash-verified (the dedup_semantic pattern). */
  val dedupContainment = QuerySpec(
    "dedup_containment",
    "shingle containment (overlap coefficient) per candidate pair + subset-copy flag",
    Some(s"""WITH t AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sh AS (SELECT doc_id, source, UNNEST($shinglesSql) AS s FROM t),
            |tau AS (SELECT source, GREATEST($MaxShingleDf,
            |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS tau
            |  FROM documents GROUP BY source),
            |kept AS (SELECT doc_id, source, s FROM
            |  (SELECT doc_id, source, s, COUNT(*) OVER (PARTITION BY source, s) AS df FROM sh)
            |  JOIN tau USING (source) WHERE df <= tau),
            |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY 1),
            |ix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
            |  FROM kept a JOIN kept b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_a, doc_b, n_inter, sa.n AS na, sb.n AS nb,
            |  (1000 * n_inter) // LEAST(sa.n, sb.n) AS cont_x1000,
            |  (1000 * n_inter) // LEAST(sa.n, sb.n) >= 900
            |    AND (1000 * n_inter) // (sa.n + sb.n - n_inter) < 900 AS is_subset_copy
            |FROM ix JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, dir, scope) => containmentPairs(docs(s, dir), scope)
      .orderBy("doc_a", "doc_b"))

  /** A pair is a TRUE duplicate when its exact capped-shingle Jaccard
    * reaches this (permille) — the threshold the recall gate measures
    * LSH candidate generation against. 500 (= Jaccard 0.5) sits far
    * below the planted ~0.99 near-dups and far above the ~0.002 random
    * background, so the truth set is exactly the planted duplicates at
    * every SF. */
  val TruthJaccardX1000: Long = 500L

  /** LSH QUALITY GATE — the dedup family's in-gate measurement claim,
    * the `sim_ivf_recall` pattern applied to candidate generation: exact
    * df-capped n-gram Jaccard ([[ngramJaccardPairs]] — the family's own
    * verify law) defines the truth duplicate set at ≥
    * [[TruthJaccardX1000]], and the banded MinHash candidates are scored
    * against it. Recall says how many true duplicate pairs banding
    * surfaces (at j≈0.99 a 4-band×2-row scheme collides with p ≈
    * 1−(1−j²)⁴ ≈ 0.9996, so missing dups means the implementation —
    * not the math — broke); precision says how much verify work each
    * surfaced candidate is worth. The raise_error gate is the corpus-level
    * beats-random law restated for pairs: LSH precision must beat random
    * pair sampling (n_truth/n_possible) by 10× — banding that degraded to
    * random bucketing fails the CORRECTNESS gate, not a dashboard.
    *
    * One summary row (the measurement IS the output); every input arm is
    * an existing gated entry's law, so this entry can only drift if they
    * do. Truth is same-source-blocked (the verify stage's own blocking) —
    * a cross-source true dup would count against precision, honestly: the
    * pipeline as shipped would not verify it. */
  val dedupLshRecall = QuerySpec(
    "dedup_lsh_recall",
    "LSH candidate quality vs exact-Jaccard truth: recall/precision + beats-random gate",
    Some(s"""WITH ${minhashPairsCtes("documents", "mh")},
            |t AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sh AS (SELECT doc_id, source, UNNEST($shinglesSql) AS s FROM t),
            |tau AS (SELECT source, GREATEST($MaxShingleDf,
            |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS tau
            |  FROM documents GROUP BY source),
            |kept AS (SELECT doc_id, source, s FROM
            |  (SELECT doc_id, source, s, COUNT(*) OVER (PARTITION BY source, s) AS df FROM sh)
            |  JOIN tau USING (source) WHERE df <= tau),
            |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY 1),
            |ix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
            |  FROM kept a JOIN kept b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |truth AS MATERIALIZED (SELECT doc_a, doc_b FROM ix
            |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
            |  WHERE (1000 * n_inter) // (sa.n + sb.n - n_inter) >= $TruthJaccardX1000),
            |cand AS MATERIALIZED (SELECT doc_a, doc_b FROM mhpairs),
            |m AS (SELECT
            |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
            |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cands,
            |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth JOIN cand USING (doc_a, doc_b)) AS n_hits,
            |  (SELECT CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) FROM documents) AS n_possible)
            |SELECT n_truth, n_cands, n_hits,
            |  (1000 * n_hits) // GREATEST(n_truth, 1) AS recall_permille,
            |  (1000 * n_hits) // GREATEST(n_cands, 1) AS precision_permille,
            |  n_hits * n_possible > 10 * n_cands * n_truth AS beats_random
            |FROM m""".stripMargin),
    (s, dir, scope) => {
      // truth feeds its own count AND the hit join; persisted (the exact
      // pair generation underneath is the corpus-sized arm)
      val truth = scope.track(ngramJaccardPairs(docs(s, dir), scope = scope)
        .filter(col("jac_x1000") >= TruthJaccardX1000)
        .select(col("doc_a"), col("doc_b")))
      val cand = scope.track(minhashParts(s, dir, scope)._2
        .select(col("doc_a"), col("doc_b")))
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nC = cand.agg(count(lit(1)).as("n_cands"))
      val nH = truth.join(cand, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hits"))
      val nP = docs(s, dir).agg(
        expr("(count(1) * (count(1) - 1)) div 2").as("n_possible"))
      nT.crossJoin(nC).crossJoin(nH).crossJoin(nP)
        .select(col("n_truth"), col("n_cands"), col("n_hits"),
          // GREATEST guards: a corpus with no ≥τ truth pairs (or an LSH
          // collapse to zero candidates) must reach the LABELED
          // beats-random raise_error below (0 > 0 is false), not die in
          // an opaque ANSI DIVIDE_BY_ZERO the two engines handle
          // differently (DuckDB // yields NULL)
          expr("(1000 * n_hits) div greatest(n_truth, 1L)").as("recall_permille"),
          expr("(1000 * n_hits) div greatest(n_cands, 1L)").as("precision_permille"),
          when(col("n_hits") * col("n_possible") > lit(10) * col("n_cands") * col("n_truth"),
            lit(true)).otherwise(raise_error(concat(
              lit("dedup_lsh_recall: LSH banding no better than random pair sampling: hits="),
              col("n_hits").cast("string"), lit(" cands="),
              col("n_cands").cast("string")))).as("beats_random"))
    })

  /** Containment projection over [[ngramJaccardPairs]] — factored so the
    * planted subset-copy spec can prove the flag FIRES (the corpus keeps it
    * vacuously false; see the dedup_containment scaladoc). */
  private[graft] def containmentPairs(docSrc: DataFrame,
      scope: CacheScope = CacheScope.Unmanaged): DataFrame =
    ngramJaccardPairs(docSrc, scope = scope)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("na"), col("nb"),
        expr("(1000 * n_inter) div least(na, nb)").as("cont_x1000"),
        (expr("(1000 * n_inter) div least(na, nb)") >= 900 &&
          col("jac_x1000") < 900).as("is_subset_copy"))

  /** Duplicate-CLUSTER resolution — the step real pipelines need after
    * candidate generation: LSH pairs only say "a≈b"; choosing one canonical
    * doc per transitive duplicate group requires connected components
    * (a≈b, b≈c ⇒ {a,b,c} is one cluster even if a,c never collided).
    *
    * Spark side: alternating large-star/small-star contraction
    * ([[graft.operators.ConnectedComponents]]) — O(log diameter) rounds on
    * a contracting edge set, the billion-edge-safe formulation (a planted
    * 64-node chain: 5 star rounds vs 63 min-propagation rounds;
    * OperatorSpec pins both). Oracle: DuckDB recursive-CTE transitive
    * closure — an independent formulation of the same fixpoint.
    *
    * Output: every doc in any duplicate cluster, its canonical (min) id,
    * and the cluster size. */
  val dedupClusters = QuerySpec(
    "dedup_clusters",
    "duplicate-cluster resolution: connected components over LSH pairs",
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs
            |  UNION SELECT doc_a, doc_a FROM pairs
            |  UNION SELECT doc_b, doc_b FROM pairs),
            |reach(src, dst) AS (SELECT src, dst FROM e
            |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            |lab AS (SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS canonical_id
            |  FROM reach GROUP BY src)
            |SELECT doc_id, canonical_id,
            |  CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS cluster_size
            |FROM lab ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      val (labels, _) = graft.operators.ConnectedComponents.run(
        pairsDf.select(col("doc_a"), col("doc_b")), scope = scope)
      val w = Window.partitionBy("canonical_id")
      labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .withColumn("cluster_size", count(lit(1)).over(w))
        .orderBy("doc_id")
    })

  /** Iterative PageRank over the LSH candidate graph — ranks each document's
    * centrality within its duplicate neighborhood (the signal pipelines use
    * to pick the best-connected canonical, not just the min id). Three
    * power iterations with INTEGER-EXACT arithmetic: ranks are micro-units
    * (1e6 = 1.0) and each step is r' = 150000 + Σ (r·85 div 100) div deg —
    * integer sums commute, so the result is identical under any partitioning
    * or execution order, unlike float PageRank which is not reproducible
    * distributed. Plan shape at scale: per iteration, one join of the edge
    * list to the compact rank table (edges persisted and re-partitioned by
    * src ONCE, ranks the small side) + one aggregation by dst — the standard
    * distributed PageRank round; the oracle recomputes the same fixpoint as
    * three chained CTEs. Every graph node has degree ≥ 1 (edges come from
    * pairs), so no dangling-mass term is needed. */
  val graphPagerank = QuerySpec(
    "graph_pagerank",
    "integer-exact PageRank (3 iterations) over the LSH candidate graph",
    Some(s"""WITH $minhashPairsCtes,
            |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION ALL SELECT doc_b, doc_a FROM pairs),
            |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
            |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
            |r1 AS (SELECT e.dst AS node, CAST(150000 + SUM(((r.pr * 85) // 100) // d.deg) AS BIGINT) AS pr
            |  FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
            |r2 AS (SELECT e.dst AS node, CAST(150000 + SUM(((r.pr * 85) // 100) // d.deg) AS BIGINT) AS pr
            |  FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
            |r3 AS (SELECT e.dst AS node, CAST(150000 + SUM(((r.pr * 85) // 100) // d.deg) AS BIGINT) AS pr
            |  FROM e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1)
            |SELECT r3.node AS doc_id, d.deg, r3.pr AS pr_micros
            |FROM r3 JOIN deg d ON d.src = r3.node
            |ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      // undirected edge list with out-degree attached, built once: each
      // iteration then joins ONLY the compact (node, pr) table against it.
      // The edge list is localCheckpoint'ed, not merely persisted: it sits
      // on the DEEPEST lineage in the catalog (MinHash CTE chain → band
      // join → pairs), so under a plain persist an evicted block cascades
      // into recomputing the whole LSH chain once per iteration — the
      // plausible mechanism of the r6 driver run's 10× blowup, and a real
      // fragility under executor memory pressure at scale. The checkpoint
      // truncates that lineage for one extra materialization; its blocks
      // are scope-owned. `deg` is checkpointed too (node-count-sized): it
      // feeds the r0 init AND the final join, which would otherwise each
      // replan the full chain.
      val edges = pairsDf.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairsDf.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val edgesC = scope.checkpoint(edges.repartition(col("src")))
      val deg = scope.checkpoint(edgesC.groupBy("src").agg(count(lit(1)).as("deg")))
      val edgesDeg = scope.checkpoint(edgesC.join(deg, "src"))
      // edgesC is superseded by edgesDeg — free its blocks now rather than
      // holding 2x the edge list until scope release
      CacheScope.freeCheckpoint(edgesC)
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        ranks = edgesDeg.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg((lit(150000L) + sum(expr("((pr * 85) div 100) div deg"))).as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
      val out = ranks.join(deg, col("node") === col("src"))
        .select(col("node").as("doc_id"), col("deg"), col("pr").as("pr_micros"))
        .orderBy("doc_id")
      out
    })

  /** Triangle counting over the LSH candidate graph — the clustering-
    * coefficient signal that separates a tight duplicate clique from a
    * chain of borderline matches (a clique of n near-dups has C(n,3)
    * triangles; a hash-collision chain has none).
    *
    * Spark side uses DEGREE-ORDERED orientation (the MapReduce-era
    * node-iterator++: orient every edge from the lower-(degree, id) endpoint
    * to the higher): every wedge is enumerated at its lowest-ranked vertex,
    * so the per-node wedge fan is bounded by min(deg, √(2m)) and the hub of
    * a skewed graph never enumerates deg² wedges — at 10⁹ edges this is the
    * difference between O(m^1.5) and O(m·maxdeg). Each triangle is found
    * exactly once (its unique two-out-edge vertex), so no /3 correction is
    * needed. The oracle counts the same triangles with the textbook
    * a<b<c 3-way self-join — same multiset, independently derived. */
  val graphTriangles = QuerySpec(
    "graph_triangles",
    "per-document triangle counts over the LSH candidate graph (degree-oriented)",
    Some(s"""WITH $minhashPairsCtes,
            |e AS (SELECT doc_a AS u, doc_b AS v FROM pairs),
            |tri AS (
            |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
            |  FROM e e1
            |  JOIN e e2 ON e2.u = e1.v
            |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
            |SELECT node AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
            |FROM (SELECT UNNEST([a, b, c]) AS node FROM tri)
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      graft.operators.TriangleCount
        .perNode(pairsDf, srcCol = "doc_a", dstCol = "doc_b", scope = scope)
        .select(col("node").as("doc_id"), col("n_triangles"))
        .orderBy("doc_id")
    })

  /** Paragraph-level (chunk-level) exact dedup — the sub-document pass (C4 /
    * RefinedWeb run this on lines or paragraphs): boilerplate repeats ACROSS
    * documents even when no two whole documents match, so whole-doc dedup
    * misses it entirely. The corpus text has no paragraph delimiters, so
    * "paragraphs" are fixed 10-word chunks (including the short tail chunk) —
    * the same fixed-window chunking real pipelines use for delimiter-free
    * text.
    *
    * Scale shape: chunks reduce to 16-byte MD5 digests BEFORE any shuffle, so
    * both the frequency aggregation and the join back move digests, never
    * text; the exploded digest table is persisted once and feeds both
    * branches. No broadcast hint is forced on the frequency side: Catalyst
    * broadcasts it while it's measurably small (EXPLAIN.md's plan at test
    * scale) and falls back to a digest-keyed hash join at corpus scale,
    * where both sides arrive partitioned on the same key. Output per doc:
    * chunk counts, how many of its chunks appear in >= 2 docs, and an
    * integer-exact duplication ratio — the number a pipeline thresholds on to
    * drop boilerplate-heavy docs. */
  val dedupParagraph = QuerySpec(
    "dedup_paragraph",
    "sub-document dedup: 10-word-chunk cross-document duplication ratio",
    Some("""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
           |c AS (SELECT doc_id, UNNEST(LIST_DISTINCT(
           |    LIST_TRANSFORM(GENERATE_SERIES(1, (LEN(ws) + 9) // 10),
           |      i -> ARRAY_TO_STRING(ws[(i-1)*10+1 : LEAST(i*10, LEN(ws))], ' ')))) AS chunk
           |  FROM t),
           |h AS (SELECT doc_id, MD5(chunk) AS h FROM c),
           |f AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_docs FROM h GROUP BY 1)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           |  CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           |  (1000 * CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS dup_x1000
           |FROM h JOIN f USING (h)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val ws = col("ws")
      val chunks = transform(sequence(lit(1), ((size(ws) + 9) / 10).cast("int")),
        i => array_join(slice(ws, (i - 1) * 10 + 1, lit(10)), " "))
      // persisted (scope-owned): the 16-byte digest table feeds the
      // frequency aggregation AND the join back — without the cache the
      // split+chunk+MD5 scan runs twice over the full corpus
      // unhex: the digest shuffles as its 16 RAW BYTES, not the 32-char hex
      // rendering (half the key bytes on the dominant shuffle); the oracle
      // groups the hex form — a bijection, so the equivalence classes and
      // every downstream count are identical
      val ch = scope.track(docs(s, dir).select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"), explode(array_distinct(chunks)).as("chunk"))
        .select(col("doc_id"), unhex(md5(col("chunk"))).as("h")))
      // (doc_id, h) is distinct per doc, so count(*) counts documents
      val freq = ch.groupBy("h").agg(count(lit(1)).as("n_docs"))
      ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          expr("(1000 * n_dup_chunks) div n_chunks").as("dup_x1000"))
        .orderBy("doc_id")
    })

  /** Substring-level (arbitrary-boundary) exact dedup — the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" family:
    * repeated SPANS (boilerplate headers/footers, templated sentences)
    * recur across documents at arbitrary token offsets, so the fixed
    * 10-word chunk grid of [[dedupParagraph]] misses any repeat that
    * straddles a chunk boundary. Here EVERY k-token window (k = 8, sliding
    * by one token — all n−k+1 positions) is a dedup unit: a window's
    * digest appearing in ≥ 2 distinct documents marks a cross-document
    * repeated span, and a document whose repeated-window fraction exceeds
    * the 50% threshold is flagged for removal/trimming — the decision
    * variable real pipelines threshold on.
    *
    * The paper's suffix-array formulation is a SINGLE-MACHINE shape (one
    * global sorted suffix order); the distributed equivalent used here is
    * the hash-window formulation: every window reduces to a 16-byte MD5
    * digest map-side, the cross-document frequency is one digest-keyed
    * aggregation, and flagging is a join back on the digest — identical
    * output law (a k-window repeats iff its hash repeats, modulo MD5
    * collisions), but every shuffle moves digests, never text, and nothing
    * needs a global sort. Window count per doc is n−k+1 ≈ token count, so
    * the exploded digest table is O(total tokens) — the same cardinality
    * class as the MinHash shingle table, and the same within-doc
    * `array_distinct` dedup caps a pathological self-repeating doc at its
    * distinct-window count. Docs shorter than k tokens have no windows and
    * are absent by convention on both sides (nothing to deduplicate). */
  /** The window law shared by [[dedupSubstring]] and [[dedupSubstringTrim]]
    * — k, the per-position window text, and the guarded sliding transform
    * (Spark's `sequence(1, n)` runs DESCENDING when n < 1, so the short-doc
    * case must short-circuit to an empty array; DuckDB's GENERATE_SERIES is
    * simply empty there). One definition so the two entries can never
    * disagree on what a window is. */
  private val SubstringK = 8

  private def substringWindowAt(i: Column): Column =
    array_join(slice(col("ws"), i, lit(SubstringK)), " ")

  private def substringWindows(elem: Column => Column, elemType: String): Column =
    when(size(col("ws")) >= SubstringK,
      transform(
        sequence(lit(1), (size(col("ws")) - (SubstringK - 1)).cast("int")),
        elem))
      .otherwise(array().cast(s"array<$elemType>"))

  /** DuckDB twins of the same law: the series bound and the window text. */
  private val SubstringBoundSql = s"GREATEST(LEN(ws) - ${SubstringK - 1}, 0)"
  private val SubstringWinSql =
    s"ARRAY_TO_STRING(ws[i : i + ${SubstringK - 1}], ' ')"

  val dedupSubstring = QuerySpec(
    "dedup_substring",
    "substring dedup: sliding 8-token window cross-document repeated-span fraction",
    Some(s"""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
           |w AS (SELECT doc_id, UNNEST(LIST_DISTINCT(
           |    LIST_TRANSFORM(GENERATE_SERIES(1, $SubstringBoundSql),
           |      i -> $SubstringWinSql))) AS win
           |  FROM t),
           |h AS (SELECT doc_id, MD5(win) AS h FROM w),
           |f AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_docs FROM h GROUP BY 1)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           |  CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           |  (1000 * CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS dup_x1000,
           |  ((1000 * CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*)) >= 500 AS is_flagged
           |FROM h JOIN f USING (h)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val wins = substringWindows(i => substringWindowAt(i), "string")
      // persisted (scope-owned): the digest table feeds the frequency
      // aggregation AND the join back — same two-branch shape as
      // dedup_paragraph, at window (not chunk) granularity
      // unhex: 16 raw digest bytes on the wire instead of 32 hex chars —
      // this shuffle is O(total tokens), so the key width IS the cost; the
      // oracle's hex grouping is a bijection of the same classes
      val wh = scope.track(docs(s, dir).select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"), explode(array_distinct(wins)).as("win"))
        .select(col("doc_id"), unhex(md5(col("win"))).as("h")))
      // (doc_id, h) is distinct per doc, so count(*) counts documents
      val freq = wh.groupBy("h").agg(count(lit(1)).as("n_docs"))
      wh.join(freq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
        .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
          expr("(1000 * n_dup_windows) div n_windows").as("dup_x1000"),
          (expr("(1000 * n_dup_windows) div n_windows") >= 500).as("is_flagged"))
        .orderBy("doc_id")
    })

  /** Substring-dedup TRIM accounting — the actual INTERVENTION of the Lee
    * et al. 2022 recipe ([[dedupSubstring]] is the detection half): the
    * paper REMOVES each repeated span rather than dropping whole
    * documents, so the decision variable is per-doc token coverage — a
    * token is trimmed iff at least one cross-document-duplicated 8-token
    * window covers it (the union of [pos, pos+7] intervals over
    * duplicated windows, computed exactly, not approximated by
    * window-count×8 which over-counts every overlap). Output per doc:
    * token count, trimmed and retained token counts, and the integer
    * trim fraction — what a pipeline budgets against before rewriting
    * shards.
    *
    * Scale shape: windows carry their POSITION here (the union needs it),
    * so within-doc duplicate windows are kept distinct in the position
    * table and cross-document frequency counts DISTINCT docs per digest;
    * the digest table is scope-persisted and feeds both the frequency
    * aggregation and the coverage join (the dedup_paragraph two-branch
    * shape). The coverage explode fans each duplicated window to its k=8
    * token slots, then the distinct + count collapse on (doc_id, token) —
    * all shuffles move (digest | doc_id, int) pairs, never text, and the
    * fan-out is bounded by k × duplicated-window count.
    *
    * The per-doc token count is a SECOND (column-pruned) pass over the
    * corpus, deliberately: deriving it from the digest table would drop
    * sub-k docs from the output (they have no windows but a real token
    * count), and caching the window fan-out to serve it would hold ~k×
    * the corpus text in executor memory — re-reading two thin columns is
    * the cheaper side of that trade at any scale. */
  val dedupSubstringTrim = QuerySpec(
    "dedup_substring_trim",
    "substring-dedup trim accounting: exact token coverage of duplicated 8-token windows",
    Some(s"""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
           |w0 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(
           |    GENERATE_SERIES(1, $SubstringBoundSql),
           |    i -> {'pos': i, 'h': MD5($SubstringWinSql)})) AS e
           |  FROM t),
           |w AS (SELECT doc_id, e.pos AS pos, e.h AS h FROM w0),
           |f AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1),
           |cov0 AS (SELECT w.doc_id, UNNEST(GENERATE_SERIES(w.pos, w.pos + ${SubstringK - 1})) AS tok
           |  FROM w JOIN f USING (h) WHERE f.n_docs >= 2),
           |cov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cov
           |  FROM (SELECT DISTINCT doc_id, tok FROM cov0) GROUP BY 1),
           |n AS (SELECT doc_id, CAST(LEN(ws) AS BIGINT) AS n_tokens FROM t)
           |SELECT n.doc_id, n.n_tokens,
           |  COALESCE(cov.n_cov, 0) AS n_trimmed,
           |  n.n_tokens - COALESCE(cov.n_cov, 0) AS n_retained,
           |  (1000 * COALESCE(cov.n_cov, 0)) // n.n_tokens AS trim_x1000
           |FROM n LEFT JOIN cov ON cov.doc_id = n.doc_id
           |ORDER BY n.doc_id""".stripMargin),
    (s, dir, scope) => {
      // unhex as in dedup_substring: the positioned digest table shuffles
      // 16-byte binary keys; the oracle keeps hex (same classes, bijective)
      val wins = substringWindows(
        i => struct(i.cast("long").as("pos"),
          unhex(md5(substringWindowAt(i))).as("h")),
        "struct<pos:bigint,h:binary>")
      val base = docs(s, dir).select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
          wins.as("wins"))
      // persisted: the positioned digest table feeds the cross-doc
      // frequency aggregation AND the coverage join
      val w = scope.track(base
        .select(col("doc_id"), explode(col("wins")).as("e"))
        .select(col("doc_id"), col("e.pos").as("pos"), col("e.h").as("h")))
      val f = w.groupBy("h").agg(countDistinct(col("doc_id")).as("n_docs"))
      val cov = w.join(f, "h").filter(col("n_docs") >= 2)
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (SubstringK - 1))).as("tok"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
      // the thin second pass documented above (doc_id + token count only)
      base.select(col("doc_id"), col("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .withColumn("n_trimmed", coalesce(col("n_cov"), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("n_trimmed"),
          (col("n_tokens") - col("n_trimmed")).as("n_retained"),
          expr("(1000 * n_trimmed) div n_tokens").as("trim_x1000"))
        .orderBy("doc_id")
    })

  /** Canonical-document selection — the KEEP decision that follows cluster
    * resolution: [[dedupClusters]] says which documents are transitive
    * duplicates of each other; a pipeline must then keep exactly ONE per
    * cluster, and real pipelines keep the BEST copy (here: longest `n_chars`,
    * doc_id as the total-order tie-break), not an arbitrary one. Composes the
    * star-contraction components with a per-cluster argmax — one extra
    * window over the (tiny) labeled-duplicate table, nothing touches the
    * full corpus except the n_chars lookup join. Oracle: the independent
    * recursive-CTE closure plus FIRST_VALUE over the same ordering. */
  val dedupCanonical = QuerySpec(
    "dedup_canonical",
    "canonical selection: keep the best-quality doc per duplicate cluster",
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs
            |  UNION SELECT doc_a, doc_a FROM pairs
            |  UNION SELECT doc_b, doc_b FROM pairs),
            |reach(src, dst) AS (SELECT src, dst FROM e
            |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            |lab AS (SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS canonical_id
            |  FROM reach GROUP BY src),
            |q AS (SELECT lab.doc_id, lab.canonical_id, d.n_chars
            |  FROM lab JOIN documents d ON d.doc_id = lab.doc_id)
            |SELECT doc_id, canonical_id,
            |  CAST(FIRST_VALUE(doc_id) OVER (PARTITION BY canonical_id
            |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS keep_id,
            |  doc_id = FIRST_VALUE(doc_id) OVER (PARTITION BY canonical_id
            |    ORDER BY n_chars DESC, doc_id) AS is_kept,
            |  CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS cluster_size
            |FROM q ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      val (labels, _) = graft.operators.ConnectedComponents.run(
        pairsDf.select(col("doc_a"), col("doc_b")), scope = scope)
      val sized = labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .join(docs(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      val byCluster = Window.partitionBy("canonical_id")
      val best = byCluster.orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      sized
        .select(col("doc_id"), col("canonical_id"),
          first(col("doc_id")).over(best).as("keep_id"),
          (col("doc_id") === first(col("doc_id")).over(best)).as("is_kept"),
          count(lit(1)).over(byCluster).as("cluster_size"))
        .orderBy("doc_id")
    })

  /** Incremental (batch-vs-history) dedup — the shape a CONTINUOUSLY
    * INGESTING pipeline actually runs: yesterday's corpus is already
    * deduped; only today's batch must be checked against it. Re-running
    * whole-corpus dedup per day is O(corpus) forever; checking the batch
    * against a history KEY INDEX is O(batch).
    *
    * Plan (the part that matters at 100 TB): history keys distill to a
    * bounded bucket table (distinct xxhash64 mod 2^16 — a one-hash Bloom
    * filter whose size is CAPPED at 65536 rows no matter how large history
    * grows), broadcast to every executor. Batch rows missing from the bucket
    * table are DEFINITELY new and never enter the join; only possible-dup
    * survivors shuffle against the history key table, which the exact join
    * then confirms (bloom false positives come back non-matching, so results
    * are exact regardless of FP rate). xxhash64 is fine here precisely
    * because the prefilter is invisible to the result — only the plan
    * changes. The split uses doc_id%10: <7 = history, >=7 = today's batch.
    *
    * Graduation path: a 2^16 bucket table saturates once history holds a few
    * hundred thousand DISTINCT keys (every bucket occupied → the prefilter
    * passes everything and the query degrades gracefully to the plain join —
    * still exact, just not cheaper). Before that point, widen the modulus
    * (2^20 ≈ 8 MB of longs still broadcasts trivially); beyond ~10^8 keys,
    * swap the bucket TABLE for a real bit-packed Bloom filter — 10^9 keys
    * at 16 bits/key is ~2 GB of bits, executor-resident, vs an unshippable
    * 8 GB long table. Same invisibility argument, same exact confirm join.
    * That graduation path is IMPLEMENTED as `dedup_bloom_inc`
    * ([[graft.operators.BloomFilter]]), sharing this entry's oracle
    * verbatim. */
  /** The incremental-dedup OUTPUT LAW, shared verbatim by
    * `dedup_incremental` (bucket-table prefilter) and `dedup_bloom_inc`
    * (bit-packed Bloom prefilter): both prefilters are invisible to
    * results, so the two entries must hash to the same oracle — an
    * implementation drift between the plans fails the gate. */
  private val incrementalOracleSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    $setKeySql AS set_key
      |  FROM documents),
      |h AS (SELECT set_key, CAST(COUNT(*) AS BIGINT) AS n_hist,
      |    CAST(MIN(doc_id) AS BIGINT) AS first_hist_id
      |  FROM t WHERE doc_id % 10 < 7 GROUP BY 1)
      |SELECT b.doc_id, b.set_key,
      |  h.first_hist_id IS NOT NULL AS is_dup,
      |  COALESCE(h.n_hist, 0) AS n_hist,
      |  h.first_hist_id
      |FROM t b LEFT JOIN h ON b.set_key = h.set_key
      |WHERE b.doc_id % 10 >= 7 ORDER BY doc_id""".stripMargin

  /** The batch/history key derivation both incremental entries share: the
    * normalized word-set digest split by doc_id decile (<7 history, >=7
    * today's batch). */
  private def incrementalKeyed(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(words)))).as("set_key"))

  val dedupIncremental = QuerySpec(
    "dedup_incremental",
    "incremental dedup: new batch vs history with a broadcast bucket prefilter",
    Some(incrementalOracleSql),
    (s, dir, scope) => {
      val keyed = incrementalKeyed(s, dir)
      val hist = scope.track(keyed.filter(col("doc_id") % 10 < 7)
        .groupBy("set_key")
        .agg(count(lit(1)).as("n_hist"), min(col("doc_id")).as("first_hist_id")))
      val batch = keyed.filter(col("doc_id") % 10 >= 7)
        .withColumn("bucket", pmod(xxhash64(col("set_key")), lit(65536L)))
      // bounded-size bucket table (<= 65536 rows): unconditional broadcast is
      // structurally safe, like the fixed-size nation/region dims
      val buckets = broadcast(
        hist.select(pmod(xxhash64(col("set_key")), lit(65536L)).as("bucket")).distinct())
      val definitelyNew = batch.join(buckets, Seq("bucket"), "left_anti")
        .select(col("doc_id"), col("set_key"), lit(false).as("is_dup"),
          lit(0L).as("n_hist"), lit(null).cast("long").as("first_hist_id"))
      val confirmed = batch.join(buckets, Seq("bucket"), "left_semi")
        .join(hist, Seq("set_key"), "left")
        .select(col("doc_id"), col("set_key"),
          col("first_hist_id").isNotNull.as("is_dup"),
          coalesce(col("n_hist"), lit(0L)).as("n_hist"),
          col("first_hist_id"))
      definitelyNew.union(confirmed).orderBy("doc_id")
    })

  /** `dedup_incremental`'s documented GRADUATION PATH, implemented: the
    * same batch-vs-history law behind a real bit-packed Bloom filter
    * ([[graft.operators.BloomFilter]]) instead of the one-hash bucket
    * table. Where the bucket table needs a broadcast `left_anti` join and
    * saturates once history holds a few hundred thousand distinct keys,
    * the Bloom prefilter is a PURE PROJECTION (3 masked lookups into one
    * map literal, no join at all) sized at ~16 bits per key — at 10⁹
    * history keys that is ~2 GB of executor-resident bits where the long
    * table would be an unshippable 8 GB+.
    *
    * Exactness is structural, not probabilistic: no false negatives means
    * every true duplicate reaches the confirm join; false positives come
    * back non-matching from the exact join. Hence this entry shares
    * `dedup_incremental`'s oracle VERBATIM — the result is identical by
    * construction and the hash gate proves it (the sim_ivf_probe_stored
    * same-oracle pattern).
    *
    * Plan cost at 100 TB: build = one scan of history KEYS (already
    * aggregated) + a ≤ mBits/64-group aggregation; probe = zero-shuffle
    * scan of the batch; only Bloom survivors (true dups + ~0.5% FP) enter
    * the confirm join. The filter is sized from the metadata-cheap corpus
    * row count — an upper bound on distinct keys, so oversized, never
    * undersized.
    *
    * DELETION POLICY (right-to-be-forgotten over history, the
    * pipeline_rag_index_del composition): a Bloom filter cannot delete —
    * clearing a removed key's bits would create false NEGATIVES for live
    * keys sharing them, the one failure the no-false-negatives invariant
    * cannot survive. After a takedown removes keys from the exact history
    * relation, their bits stay set as STALE false positives: a deleted
    * key still passes the prefilter, reaches the confirm join, finds no
    * history row, and resolves is_dup = false — outputs stay exact with
    * zero filter maintenance (OperatorSpec plants exactly this case).
    * The only drift is FP-rate: the filter behaves as if deleted keys
    * were still inserted, so production rebuilds it from surviving keys
    * on the index's normal refresh cadence, or counts takedowns against
    * the same ~16-bits/key sizing budget and rebuilds early once they
    * exceed a few percent of n. */
  val dedupBloomInc = QuerySpec(
    "dedup_bloom_inc",
    "incremental dedup behind a bit-packed Bloom prefilter — dedup_incremental's law, zero-join prescreen",
    Some(incrementalOracleSql),
    (s, dir, scope) => {
      import graft.operators.BloomFilter
      val keyed = incrementalKeyed(s, dir)
      val hist = scope.track(keyed.filter(col("doc_id") % 10 < 7)
        .groupBy("set_key")
        .agg(count(lit(1)).as("n_hist"), min(col("doc_id")).as("first_hist_id")))
      val batch = keyed.filter(col("doc_id") % 10 >= 7)
      val mBits = BloomFilter.bitsFor(docs(s, dir).count())
      val bloom = BloomFilter.build(hist.select("set_key"), "set_key", mBits)
      val maybeDup = BloomFilter.mightContain(bloom, col("set_key"))
      val definitelyNew = batch.filter(!maybeDup)
        .select(col("doc_id"), col("set_key"), lit(false).as("is_dup"),
          lit(0L).as("n_hist"), lit(null).cast("long").as("first_hist_id"))
      val confirmed = batch.filter(maybeDup)
        .join(hist, Seq("set_key"), "left")
        .select(col("doc_id"), col("set_key"),
          col("first_hist_id").isNotNull.as("is_dup"),
          coalesce(col("n_hist"), lit(0L)).as("n_hist"),
          col("first_hist_id"))
      definitelyNew.union(confirmed).orderBy("doc_id")
    })

  /** FUZZY RECORD LINKAGE — the A-to-B entity-resolution JOIN (every other
    * dedup entry is a self-join): a "dirty feed" is matched back to the
    * catalog through the classic blocking → bounded-verify → best-match
    * cascade (the Fellegi–Sunter pipeline shape). The feed is the
    * doc_id % 3 slice with a DETERMINISTIC dirtying law both engines
    * replay — even feed ids get their title's last two characters swapped
    * (edit distance ≤ 2), odd ids pass through clean — so the entry
    * exercises exact hits, fuzzy hits, and the no-candidate path in one
    * output.
    *
    * Stages and scale shape:
    *   - BLOCK: equi-join on the title's first word — candidate pairs are
    *     per-block quadratic, never all-pairs (the dedup_ngram_jaccard
    *     blocking argument). A real corpus has Zipfian first words, so
    *     production composes multiple blocking keys or salts the heavy
    *     blocks ([[SaltedJoin]]); the plan shape is unchanged.
    *   - VERIFY: Levenshtein ≤ 2 on candidates only (cross-engine
    *     bit-parity proven by txt_edit_distance).
    *   - RESOLVE: best match per feed row by (edit_dist, doc_id) window —
    *     bounded by confirmed candidates.
    * Every feed row appears in the output (matched or not, with its
    * blocked-candidate count) — the full-coverage audit convention. */
  val dedupLinkage = QuerySpec(
    "dedup_linkage",
    "fuzzy record linkage: block on first word, Levenshtein-verify, best-match per feed row",
    Some("""WITH t AS (SELECT doc_id,
           |    ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:5], ' ') AS title FROM documents),
           |f AS (SELECT doc_id AS feed_id,
           |    CASE WHEN doc_id % 2 = 0 AND LENGTH(title) >= 2
           |         THEN SUBSTR(title, 1, LENGTH(title) - 2)
           |              || SUBSTR(title, LENGTH(title), 1)
           |              || SUBSTR(title, LENGTH(title) - 1, 1)
           |         ELSE title END AS f_title
           |  FROM t WHERE doc_id % 3 = 0),
           |fb AS (SELECT feed_id, f_title, STRING_SPLIT(f_title, ' ')[1] AS bk FROM f),
           |cb AS (SELECT doc_id, title AS c_title, STRING_SPLIT(title, ' ')[1] AS bk FROM t),
           |cand AS MATERIALIZED (SELECT fb.feed_id, fb.f_title, cb.doc_id, cb.c_title
           |  FROM fb JOIN cb USING (bk)),
           |nc AS (SELECT feed_id, CAST(COUNT(*) AS BIGINT) AS n_cands FROM cand GROUP BY 1),
           |conf AS (SELECT feed_id, doc_id,
           |    CAST(LEVENSHTEIN(f_title, c_title) AS BIGINT) AS edit_dist
           |  FROM cand WHERE LEVENSHTEIN(f_title, c_title) <= 2),
           |best AS (SELECT feed_id, doc_id, edit_dist FROM (
           |    SELECT feed_id, doc_id, edit_dist,
           |      ROW_NUMBER() OVER (PARTITION BY feed_id ORDER BY edit_dist, doc_id) AS rn
           |    FROM conf) WHERE rn = 1)
           |SELECT f.feed_id, COALESCE(nc.n_cands, 0) AS n_cands,
           |  b.doc_id AS match_id, b.edit_dist,
           |  b.doc_id IS NOT NULL AS matched
           |FROM f LEFT JOIN nc ON nc.feed_id = f.feed_id
           |LEFT JOIN best b ON b.feed_id = f.feed_id
           |ORDER BY f.feed_id""".stripMargin),
    (s, dir, scope) => {
      val t = linkageTitled(docs(s, dir))
      // persisted: the scored blocked-candidate table feeds BOTH the
      // per-feed candidate count and the verify stage
      val scored = scope.track(
        linkageScore(linkageFeed(t).join(linkageCatalog(t), "bk")))
      linkageResolve(linkageFeed(t).select(col("feed_id")), scored)
    })

  /** The linkage laws as ONE definition each — title extraction, the
    * deterministic feed-dirtying + block key, the catalog side, candidate
    * scoring, and the count/verify/best-match resolve — shared by the
    * batch entry above and the streaming admission twin
    * (`stream_linkage`), so the two can never fork. */
  private[queries] def linkageTitled(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("title"))

  private[queries] def linkageFeed(titled: DataFrame): DataFrame =
    titled.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("feed_id"),
        when(col("doc_id") % 2 === 0 && length(col("title")) >= 2,
          concat(expr("substr(title, 1, length(title) - 2)"),
            expr("substr(title, length(title), 1)"),
            expr("substr(title, length(title) - 1, 1)")))
          .otherwise(col("title")).as("f_title"))
      .select(col("feed_id"), col("f_title"),
        element_at(split(col("f_title"), " "), 1).as("bk"))

  private[queries] def linkageCatalog(titled: DataFrame): DataFrame =
    titled.select(col("doc_id"), col("title").as("c_title"),
      element_at(split(col("title"), " "), 1).as("bk"))

  /** Every blocked pair with its verify distance — the count stage reads
    * ALL rows (candidate accounting is pre-verify), the match stage
    * filters, so scoring once here serves both. The distance is the
    * BANDED form (`levenshtein(l, r, threshold = 2)`): exact whenever the
    * verify gate can pass (≤ 2) and the −1 sentinel beyond it, computed
    * over a 2k+1-wide diagonal band — O(k·len) per pair instead of
    * O(len²), which is the whole per-pair cost of the verify stage on
    * every non-matching blocked candidate (the overwhelming majority at
    * any scale; hot Zipfian blocks make the full matrix the block-join's
    * dominant compute). [[linkageResolve]]'s gate reads `BETWEEN 0 AND 2`
    * so both representations resolve identically. */
  private[queries] def linkageScore(cand: DataFrame): DataFrame =
    cand.select(col("feed_id"), col("doc_id"),
      levenshtein(col("f_title"), col("c_title"), 2).cast("long").as("edit_dist"))

  private[queries] def linkageResolve(feedSpine: DataFrame,
      scored: DataFrame): DataFrame = {
    val nc = scored.groupBy("feed_id").agg(count(lit(1)).as("n_cands"))
    // BETWEEN 0 AND 2: correct for both the unbounded distance (always
    // ≥ 0) and the banded form's −1 beyond-threshold sentinel
    val conf = scored.filter(col("edit_dist").between(0, 2))
    val w = Window.partitionBy("feed_id").orderBy(col("edit_dist"), col("doc_id"))
    val best = conf.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("feed_id"), col("doc_id").as("match_id"), col("edit_dist"))
    feedSpine
      .join(nc, Seq("feed_id"), "left")
      .join(best, Seq("feed_id"), "left")
      .select(col("feed_id"), coalesce(col("n_cands"), lit(0L)).as("n_cands"),
        col("match_id"), col("edit_dist"), col("match_id").isNotNull.as("matched"))
      .orderBy("feed_id")
  }

  /** CONTRASTIVE TRAINING-PAIR construction — the dataset-building stage
    * an embedding-model team runs on the dedup pipeline's output: every
    * LSH near-dup pair is a POSITIVE (anchor, duplicate) sample, and each
    * gets a deterministic NEGATIVE document drawn by hash. The negative
    * law is closed-form so both engines replay it exactly: candidate
    * n₀ = h48('neg:' a ':' b) mod N, then the first of n₀, n₀+1, n₀+2
    * (mod N) that is neither a nor b — three candidates suffice to dodge
    * a 2-element exclusion set WHEN N ≥ 3; at N ≤ 2 no negative exists
    * and the law yields NULL (stated identically in both engines, so the
    * degenerate corpus cannot silently emit anchor==negative pairs). No
    * sampling state, no RNG, no skew: the negative pick is a pure
    * projection on the (bounded) candidate-pair table. PRECONDITION,
    * checked at build: doc_id must be the contiguous range 0..N−1 (the
    * corpus convention) — on sparse/shifted ids the mod-N draw would
    * reference nonexistent documents; a production run over arbitrary
    * ids first materializes a dense id index (the `corpus_order`
    * global-position pattern) and draws against that. At scale this
    * composes with `dedup_minhash_lsh`'s banded join — nothing here adds
    * a corpus-sized operation. */
  val dedupContrastive = QuerySpec(
    "dedup_contrastive",
    "contrastive pairs: LSH positives + closed-form hash-drawn negatives",
    Some(s"""WITH $minhashPairsCtes,
            |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
            |c AS (SELECT doc_a, doc_b, n_docs,
            |    ${h48Sql("'neg:' || CAST(doc_a AS VARCHAR) || ':' || CAST(doc_b AS VARCHAR)")} % n_docs AS n0
            |  FROM pairs CROSS JOIN n)
            |SELECT doc_a, doc_b,
            |  CASE WHEN n_docs <= 2 THEN NULL
            |       WHEN n0 <> doc_a AND n0 <> doc_b THEN n0
            |       WHEN (n0 + 1) % n_docs <> doc_a AND (n0 + 1) % n_docs <> doc_b THEN (n0 + 1) % n_docs
            |       ELSE (n0 + 2) % n_docs END AS neg_id
            |FROM c ORDER BY doc_a, doc_b""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      val n = lit(requireDenseDocIds(docs(s, dir), "dedup_contrastive"))
      pairsDf.select(col("doc_a"), col("doc_b"))
        .withColumn("n0", PortableHash.h48(
          concat(lit("neg:"), col("doc_a").cast("string"), lit(":"),
            col("doc_b").cast("string"))) % n)
        .select(col("doc_a"), col("doc_b"),
          when(n <= 2, lit(null).cast("long"))
            .when(col("n0") =!= col("doc_a") && col("n0") =!= col("doc_b"), col("n0"))
            .when((col("n0") + 1) % n =!= col("doc_a") &&
              (col("n0") + 1) % n =!= col("doc_b"), (col("n0") + 1) % n)
            .otherwise((col("n0") + 2) % n).as("neg_id"))
        .orderBy("doc_a", "doc_b")
    })

  /** The contiguous-id precondition behind every mod-N hash draw — ONE
    * definition shared by `dedup_contrastive` and `mm_caption_pairs`
    * (two verbatim copies of a precondition law is how the law forks):
    * one 3-column row to the driver — the draw needs N as a literal and
    * the check must fail loudly, not emit dangling ids. Returns N. */
  private[queries] def requireDenseDocIds(docsT: DataFrame,
      entry: String): Long = {
    val st = docsT.agg(count(lit(1)).as("n_docs"),
      min("doc_id").as("mn"), max("doc_id").as("mx")).collect()(0)
    val nDocs = st.getLong(0)
    require(nDocs == 0 ||
      (!st.isNullAt(1) && st.getLong(1) == 0L && st.getLong(2) == nDocs - 1),
      s"$entry requires contiguous doc_id 0..N-1; got " +
        s"n=$nDocs min=${st.get(1)} max=${st.get(2)} — densify ids first " +
        "(corpus_order pattern)")
    nDocs
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan et
    * al. 2007) over the LSH candidate graph — the third graph signal next
    * to PageRank (centrality) and triangles (cohesion): which near-dup
    * NEIGHBORHOOD a document belongs to, without the transitive-closure
    * semantics of connected components (LPA splits a chain of borderline
    * matches that CC would merge). Deliberately the fixed-round SYNC
    * variant with a (count desc, min label) tie-break: async LPA's result
    * depends on visit order — unreproducible distributed — while four
    * synchronous rounds from id-labels are a pure function of the graph,
    * identical on any cluster and replayable by the oracle's unrolled
    * rounds (oscillation on bipartite structures is bounded harmless: a
    * fixed round count is a deterministic snapshot either way).
    *
    * Scale shape: per round, ONE join of the checkpointed src-partitioned
    * edge list against the compact (node, label) table and a two-level
    * aggregation — (src, label) counts partial-aggregate map-side, the
    * argmax rides the same src partitioning (no second exchange) — the
    * standard distributed LPA round. Edge checkpoint rationale as
    * graph_pagerank (deepest lineage in the catalog). */
  val graphLabelprop = QuerySpec(
    "graph_labelprop",
    "community detection: 4 synchronous label-propagation rounds over the LSH graph",
    Some(s"""WITH $minhashPairsCtes,
            |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION ALL SELECT doc_b, doc_a FROM pairs),
            |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),
            |${(1 to 4).map(k =>
              s"""l$k AS MATERIALIZED (SELECT node, lbl FROM (
                 |  SELECT e.src AS node, l.lbl, COUNT(*) AS c,
                 |    ROW_NUMBER() OVER (PARTITION BY e.src
                 |      ORDER BY COUNT(*) DESC, l.lbl) AS rn
                 |  FROM e JOIN l${k - 1} l ON l.node = e.dst
                 |  GROUP BY e.src, l.lbl) WHERE rn = 1)""".stripMargin)
              .mkString(",\n")}
            |SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community,
            |  CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
            |FROM l4 ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      val (_, pairsDf) = minhashParts(s, dir, scope)
      val edges = pairsDf.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairsDf.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val e = scope.checkpoint(edges.repartition(col("src")))
      var labels = e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 4) {
        labels = e.join(labels, col("node") === col("dst"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
      }
      val w = Window.partitionBy("community")
      labels.select(col("node").as("doc_id"), col("lbl").as("community"))
        .withColumn("community_size", count(lit(1)).over(w))
        .orderBy("doc_id")
    })

  val all: Seq[QuerySpec] = Seq(dedupExact, dedupSourceStats, dedupMinhash, dedupSimhash,
    dedupNgramJaccard, dedupClusters, graphPagerank, graphTriangles,
    graphLabelprop,
    dedupParagraph, dedupSubstring, dedupSubstringTrim, dedupCanonical,
    dedupIncremental, dedupBloomInc, dedupContainment, dedupContrastive, dedupLshRecall,
    dedupLinkage)
}
