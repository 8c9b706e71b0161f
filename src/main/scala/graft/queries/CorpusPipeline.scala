package graft.queries

import org.apache.spark.sql.DataFrame

import graft.functions.PortableHash.h48Sql
import graft.functions.TextFunctions

/** The end-to-end corpus-curation manifest — the query a training-data team
  * actually ships: every document classified as kept / low_quality /
  * duplicate / contaminated / benchmark, with a train/val/test split for the
  * keepers. One declarative plan composes the library's stages:
  *
  *   1. quality scoring ([[graft.functions.TextFunctions.qualityScore]] — stopword ratio +
  *      length saturation, integer-exact),
  *   2. duplicate-cluster resolution (MinHash-LSH pairs →
  *      [[graft.operators.ConnectedComponents]] star contraction) keeping
  *      the best copy per cluster (n_chars, doc_id tie-break),
  *   3. benchmark-contamination screening ([[graft.functions.TextFunctions.gram5]] overlap
  *      against the `doc_id % 29 == 0` held-out slice, broadcast probe),
  *   4. deterministic hash split (the same `s2:` salt as txt_sample_split,
  *      so a doc's split NEVER changes as the corpus around it grows).
  *
  * Drop reasons are prioritized (benchmark > contaminated > duplicate >
  * low_quality) so the manifest is a partition of the corpus, and `split` is
  * non-null exactly on kept docs.
  *
  * Scale shape: the corpus parquet is scanned ONCE into (score, grams) —
  * Catalyst fuses both derivations into the scan projection and the persist
  * makes every later branch read the compact derived table; the only
  * corpus-sized shuffles are the LSH band join and the contamination
  * aggregation's doc_id distinct. The oracle recomputes all four stages
  * independently (recursive-CTE closure, window argmax, list overlap) in one
  * DuckDB statement.
  */
object CorpusPipeline {

  /** The curation-manifest CTE chain, ending at `st(doc_id, score, status,
    * hs)` — shared verbatim by `pipeline_corpus` and `pipeline_pretrain` so
    * the two oracles can never drift on what "kept" means. Callers prepend
    * `WITH RECURSIVE ` (the closure CTE needs it). The no-arg form is
    * byte-identical to the parameterized form's defaults; the PII variant
    * (`pipeline_corpus_pii`) passes a planted-text source relation and a
    * drop threshold, which inserts the `px` counts CTE and the 'pii'
    * status arm exactly where the Spark manifest inserts them. */
  private def manifestCtes: String = manifestCtes(None, "documents")

  /** `p` namespaces every CTE name so two manifest chains can coexist in
    * one statement (the `corpus_diff` oracle runs yesterday's and today's
    * corpus side by side); "" (default) leaves single-chain oracles
    * semantically unchanged (prefixed CTEs carry their bare name as a
    * table alias, so inner references are prefix-independent). */
  private def manifestCtes(piiDropAbove: Option[Long], from: String,
      p: String = "", clfDropBelow: Option[Long] = None,
      blockSources: Option[Seq[String]] = None): String = {
    val blkCte = blockSources.map { srcs =>
      val inList = graft.operators.CorpusCuration.blocklistInSql(srcs)
      s"""${p}bk AS (SELECT doc_id FROM $from WHERE source IN ($inList)),
         |""".stripMargin
    }.getOrElse("")
    val blkArm = blockSources.map(_ => s"""
         |      WHEN bk.doc_id IS NOT NULL THEN 'blocked'""".stripMargin).getOrElse("")
    val blkJoin = blockSources.map(_ => s"""
         |  LEFT JOIN ${p}bk bk ON bk.doc_id = sc.doc_id""".stripMargin).getOrElse("")
    val piiCte = piiDropAbove.map { _ =>
      val (em, ph, ip) = TextFunctions.piiCountsSql("text")
      s"""${p}px AS (SELECT doc_id, $em + $ph + $ip AS n_pii FROM $from),
         |""".stripMargin
    }.getOrElse("")
    val piiArm = piiDropAbove
      .map(t => s"""
         |      WHEN px.n_pii > $t THEN 'pii'""".stripMargin).getOrElse("")
    val piiJoin = piiDropAbove
      .map(_ => s"""
         |  LEFT JOIN ${p}px px ON px.doc_id = sc.doc_id""".stripMargin).getOrElse("")
    val clfCte = clfDropBelow.map { _ =>
      // feats built ONCE in a nested subquery, score derived over it — the
      // corpus_clf_score oracle's shape; the bare scoreMilliSql form would
      // inline the unigram+bigram construction twice (numerator + GREATEST
      // denominator) into the generated SQL
      val qc = graft.operators.QualityClassifier
      s"""${p}cf AS (SELECT doc_id, ${qc.scoreMilliOverFeatsSql("feats")} AS clf
         |  FROM (SELECT doc_id, ${qc.featsSql("ws")} AS feats FROM ${p}t)),
         |""".stripMargin
    }.getOrElse("")
    val clfArm = clfDropBelow
      .map(t => s"""
         |      WHEN cf.clf < $t THEN 'clf_reject'""".stripMargin).getOrElse("")
    val clfJoin = clfDropBelow
      .map(_ => s"""
         |  LEFT JOIN ${p}cf cf ON cf.doc_id = sc.doc_id""".stripMargin).getOrElse("")
    s"""${DedupQueries.minhashPairsCtes(from, p)},
       |${p}e AS (SELECT doc_a AS src, doc_b AS dst FROM ${p}pairs
       |  UNION SELECT doc_b, doc_a FROM ${p}pairs
       |  UNION SELECT doc_a, doc_a FROM ${p}pairs
       |  UNION SELECT doc_b, doc_b FROM ${p}pairs),
       |${p}reach(src, dst) AS (SELECT src, dst FROM ${p}e
       |  UNION SELECT r.src, e2.dst FROM ${p}reach r JOIN ${p}e e2 ON r.dst = e2.src),
       |${p}lab AS (SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS canonical_id
       |  FROM ${p}reach GROUP BY src),
       |${p}qc AS (SELECT lab.doc_id, lab.canonical_id, d.n_chars
       |  FROM ${p}lab lab JOIN documents d ON d.doc_id = lab.doc_id),
       |${p}keepx AS (SELECT doc_id, FIRST_VALUE(doc_id) OVER (PARTITION BY canonical_id
       |    ORDER BY n_chars DESC, doc_id) AS keep_id FROM ${p}qc),
       |${p}dups AS (SELECT doc_id FROM ${p}keepx WHERE doc_id <> keep_id),
       |${p}sc AS (SELECT doc_id, ${TextFunctions.qualityScoreSql} AS score FROM ${p}t),
       |$piiCte$clfCte$blkCte${p}g AS (SELECT doc_id, ${TextFunctions.gram5Sql} AS gl FROM ${p}t),
       |${p}bg AS (SELECT DISTINCT UNNEST(gl) AS gram FROM ${p}g WHERE doc_id % 29 = 0),
       |${p}ct AS (SELECT DISTINCT tr.doc_id
       |  FROM (SELECT doc_id, UNNEST(gl) AS gram FROM ${p}g WHERE doc_id % 29 <> 0) tr
       |  JOIN ${p}bg bg ON tr.gram = bg.gram),
       |${p}st AS (SELECT sc.doc_id, sc.score,
       |    CASE WHEN sc.doc_id % 29 = 0 THEN 'benchmark'
       |      WHEN ct.doc_id IS NOT NULL THEN 'contaminated'$piiArm
       |      WHEN du.doc_id IS NOT NULL THEN 'duplicate'$blkArm
       |      WHEN sc.score IS NULL OR sc.score < 300 THEN 'low_quality'$clfArm
       |      ELSE 'kept' END AS status,
       |    ${TextFunctions.splitHashSql("sc.doc_id")} AS hs
       |  FROM ${p}sc sc LEFT JOIN ${p}ct ct ON ct.doc_id = sc.doc_id
       |  LEFT JOIN ${p}dups du ON du.doc_id = sc.doc_id$piiJoin$clfJoin$blkJoin)""".stripMargin
  }

  val pipelineCorpus = QuerySpec(
    "pipeline_corpus",
    "corpus curation manifest: quality + dedup-keep + contamination + split",
    Some(s"""WITH RECURSIVE $manifestCtes
            |SELECT doc_id, status, score AS score_x1000,
            |  CASE WHEN status = 'kept' THEN
            |    ${TextFunctions.splitAssignSql("hs")}
            |  END AS split
            |FROM st ORDER BY doc_id""".stripMargin),
    (s, dir, scope) =>
      // the public operator (default Config matches this oracle literal-for-
      // literal: benchMod 29, floor 300, 80/10/10 on the s2 salt)
      graft.operators.CorpusCuration
        .manifest(Tables(s, dir, "documents"), scope = scope)
        .orderBy("doc_id"))

  /** The curation manifest WITH the PII screening stage on — the synthetic
    * corpus carries no PII, so the entry plants deterministic spans
    * (TextQueries.PlantedPii, same derive-from-doc_id pattern as the
    * benchmark slice) into the text BOTH engines curate: quality scores,
    * contamination shingles, and MinHash signatures all shift identically,
    * and docs with more than one PII hit (multiples of 35/55/77 —
    * composable plants) classify 'pii' between 'contaminated' and
    * 'duplicate'. `pipeline_corpus` stays the piiless twin, so this entry
    * gates the STAGE (arm position, threshold law, count arithmetic), not
    * a config default. */
  val pipelineCorpusPii = QuerySpec(
    "pipeline_corpus_pii",
    "curation manifest with PII screening: planted spans, drop when hits > 1",
    Some {
      val plantedFrom =
        s"(SELECT doc_id, ${TextQueries.PlantedPii.plantSql} AS text FROM documents) AS planted"
      s"""WITH RECURSIVE ${manifestCtes(Some(1L), plantedFrom)}
         |SELECT doc_id, status, score AS score_x1000,
         |  CASE WHEN status = 'kept' THEN
         |    ${TextFunctions.splitAssignSql("hs")}
         |  END AS split
         |FROM st ORDER BY doc_id""".stripMargin
    },
    (s, dir, scope) => {
      import org.apache.spark.sql.functions.col
      val d = Tables(s, dir, "documents")
      val planted = d.select(col("doc_id"),
        TextQueries.PlantedPii.plant(col("doc_id"), col("text")).as("text"),
        col("n_chars"))
      graft.operators.CorpusCuration
        .manifest(planted,
          graft.operators.CorpusCuration.Config(piiDropAbove = Some(1L)),
          scope = scope)
        .orderBy("doc_id")
    })

  /** Learned-classifier INFERENCE over the corpus
    * ([[graft.operators.QualityClassifier]]): per-doc fastText-style
    * linear score from hashed unigram+bigram features against the
    * broadcast literal model vector, emitted BESIDE the heuristic score —
    * the two signals every production curation recipe stacks. One
    * map-side scan, zero shuffle before the output sort; the whole law is
    * codegen'd higher-order functions over a literal array (no UDF). The
    * oracle recomputes the weight lookup from the inline double-hash
    * formula — equal to the Scala-precomputed literal by construction. */
  val corpusClfScore = QuerySpec(
    "corpus_clf_score",
    "quality-classifier inference: hashed-ngram linear score beside the heuristic score",
    Some {
      val qc = graft.operators.QualityClassifier
      // feats built ONCE in its own CTE; score and keep derive from one
      // clf_milli column (mirrors the Spark projection's single evaluation)
      s"""WITH d AS (SELECT doc_id, STRING_SPLIT(COALESCE(text, ''), ' ') AS ws
         |  FROM documents),
         |fs AS (SELECT doc_id, ws, ${qc.featsSql("ws")} AS feats FROM d),
         |sc AS (SELECT doc_id, ws,
         |    CAST(${qc.nFeatsOverFeatsSql("feats")} AS BIGINT) AS n_feats,
         |    CAST(${qc.scoreMilliOverFeatsSql("feats")} AS BIGINT) AS clf_milli
         |  FROM fs)
         |SELECT doc_id, n_feats, clf_milli,
         |  ${TextFunctions.qualityScoreSql} AS heuristic_x1000,
         |  clf_milli >= ${qc.KeepThresholdMilli} AS clf_keep
         |FROM sc ORDER BY doc_id""".stripMargin
    },
    (s, dir) =>
      graft.operators.QualityClassifier
        .scoreProjection(Tables(s, dir, "documents"))
        .orderBy("doc_id"))

  /** The curation manifest WITH the learned-classifier gate on — the
    * composed form ([[graft.operators.CorpusCuration.Config]]
    * `clfDropBelow`): heuristic survivors scoring below the threshold
    * classify 'clf_reject' after 'low_quality' (the heuristic floor names
    * the death first; the classifier refines among its survivors — how
    * CCNet/RefinedWeb/DCLM stack the two gates). `pipeline_corpus` stays
    * the classifier-less twin, so this entry gates the STAGE (arm
    * position, threshold law, feature hashing) — the pipeline_corpus_pii
    * pattern exactly. */
  val pipelineCorpusClf = QuerySpec(
    "pipeline_corpus_clf",
    "curation manifest with the learned-classifier gate (clf_reject below the mean)",
    Some(s"""WITH RECURSIVE ${manifestCtes(None, "documents", "",
              Some(graft.operators.QualityClassifier.KeepThresholdMilli))}
            |SELECT doc_id, status, score AS score_x1000,
            |  CASE WHEN status = 'kept' THEN
            |    ${TextFunctions.splitAssignSql("hs")}
            |  END AS split
            |FROM st ORDER BY doc_id""".stripMargin),
    (s, dir, scope) =>
      graft.operators.CorpusCuration
        .manifest(Tables(s, dir, "documents"),
          graft.operators.CorpusCuration.Config(clfDropBelow =
            Some(graft.operators.QualityClassifier.KeepThresholdMilli)),
          scope = scope)
        .orderBy("doc_id"))

  /** Blocklisted sources for the catalog entry — two of the corpus's 20
    * synthetic sources (present at every SF), standing in for a domain
    * blocklist / opt-out registry. */
  private[graft] val BlockedSources = Seq("src7", "src13")

  /** The curation manifest WITH the domain-blocklist/opt-out stage on —
    * the screening gate every public curation recipe runs (C4's badwords
    * domains, RefinedWeb's URL blocklist, robots/opt-out registries),
    * keyed here on the corpus's `source` column: listed sources classify
    * 'blocked' between 'duplicate' and 'low_quality' (compliance names
    * the death before the quality floor). The list rides a BROADCAST
    * table join, so a production blocklist of 10^5+ domains ships once
    * per executor and the screen stays map-side. `pipeline_corpus` stays
    * the unblocked twin, so this entry gates the STAGE (arm position,
    * membership law) — the pipeline_corpus_pii pattern exactly. */
  val pipelineCorpusBlocklist = QuerySpec(
    "pipeline_corpus_blocklist",
    "curation manifest with domain-blocklist/opt-out screening (broadcast source gate)",
    Some(s"""WITH RECURSIVE ${manifestCtes(None, "documents", "", None,
              Some(BlockedSources))}
            |SELECT doc_id, status, score AS score_x1000,
            |  CASE WHEN status = 'kept' THEN
            |    ${TextFunctions.splitAssignSql("hs")}
            |  END AS split
            |FROM st ORDER BY doc_id""".stripMargin),
    (s, dir, scope) =>
      graft.operators.CorpusCuration
        .manifest(Tables(s, dir, "documents"),
          graft.operators.CorpusCuration.Config(blockSources = BlockedSources),
          scope = scope)
        .orderBy("doc_id"))

  /** Training-shard manifest — the output stage after curation: every doc
    * hash-assigned to one of 16 shards (portable 48-bit hash, so the same
    * doc lands in the same shard on any cluster, any partitioning, any
    * engine — reshard-stable as the corpus grows), with per-shard document
    * and byte accounting. Hash sharding is the 100 TB-honest choice: it is
    * pure map-side with one bounded shuffle (≤ shards rows after partial
    * aggregation), balanced by the law of large numbers — unlike LPT-style
    * bin packing, whose global size-ordered rank needs a full sort. The
    * id_sum column fingerprints shard MEMBERSHIP, not just sizes, so a
    * single doc in the wrong shard fails the hash gate. */
  val corpusShards = QuerySpec(
    "corpus_shards",
    "training-shard manifest: deterministic hash sharding + per-shard accounting",
    Some(s"""WITH s AS (SELECT doc_id, n_chars,
            |    ${h48Sql("'sh:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard
            |  FROM documents)
            |SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
            |FROM s GROUP BY shard ORDER BY shard""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val shard = graft.functions.PortableHash
        .h48(concat(lit("sh:"), col("doc_id").cast("string"))) % 16
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), shard.as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          sum("doc_id").as("id_sum"))
        .orderBy("shard")
    })

  /** t* from the bounded score histogram: the smallest score whose
    * EXCLUSIVE descending prefix (mass strictly above the bucket) fits 40%
    * of `sc`'s total mass. `sc` needs integer `score` 0..1000 plus the
    * `mass` column; at most 1001 bucket rows cross the shuffle, the
    * single-partition window runs over that bounded table, and the 1-row
    * result broadcasts to the corpus-sized filter. The exclusive prefix
    * means the best bucket's prefix is 0, so it always passes — a top
    * bucket larger than the whole budget selects itself, never zero docs. */
  private def histogramThreshold(sc: org.apache.spark.sql.DataFrame,
      mass: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val budget = sc.agg(expr(s"sum($mass) * 2 div 5").as("budget"))
    val above = sc.groupBy("score").agg(sum(mass).as("m"))
      .withColumn("above", sum("m").over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score").desc))
        - col("m"))
    above.crossJoin(broadcast(budget))
      .filter(col("above") < col("budget"))
      .agg(min("score").as("tstar"))
  }

  /** Token-budget selection WITHOUT a global sort — the "take the best docs
    * until the budget is spent" step. The naive form (ORDER BY score DESC,
    * running SUM, cut at the budget) is a single-reducer global sort at
    * 100 TB; here the cutoff comes from the score HISTOGRAM instead:
    * quality scores are integer 0..1000, so bucket char-mass by score
    * (partial-aggregated, ≤ 1001 rows cross the shuffle), run the
    * cumulative sum over that BOUNDED table, pick the smallest score t*
    * whose descending prefix fits the budget (40% of corpus chars), and
    * keep docs with score ≥ t* via a broadcast threshold — whole-bucket
    * granularity, which is the standard trade for sort-free selection.
    * The cut uses the EXCLUSIVE prefix (mass strictly above the bucket ≤
    * budget), so the best bucket is always kept — over-shoot is bounded
    * by one bucket's mass, and a corpus whose top bucket alone exceeds
    * the budget still selects it rather than collapsing to zero docs.
    * Both engines derive t* independently from the same histogram. */
  val corpusBudget = QuerySpec(
    "corpus_budget_select",
    "token-budget doc selection via bounded score-histogram threshold (no global sort)",
    Some(s"""WITH d AS (SELECT doc_id, n_chars, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sc AS (SELECT doc_id, n_chars, ${TextFunctions.qualityScoreSql} AS score FROM d),
            |b AS (SELECT score, SUM(n_chars) AS chars FROM sc GROUP BY score),
            |r AS (SELECT score,
            |    SUM(chars) OVER (ORDER BY score DESC) - chars AS above FROM b),
            |t AS (SELECT MIN(score) AS tstar FROM r
            |  WHERE above < (SELECT SUM(n_chars) * 2 // 5 FROM documents))
            |SELECT doc_id, CAST(score AS BIGINT) AS score_x1000, CAST(n_chars AS BIGINT) AS n_chars
            |FROM sc, t WHERE sc.score >= t.tstar ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      // feeds the histogram AND the final threshold filter (scope-owned)
      val sc = scope.track(Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("n_chars"),
          TextFunctions.qualityScore(col("ws")).as("score")))
      // the 1-row threshold reaches the corpus-sized filter as a
      // broadcast, never a shuffle
      sc.crossJoin(broadcast(histogramThreshold(sc, "n_chars")))
        .filter(col("score") >= col("tstar"))
        .select(col("doc_id"), col("score").as("score_x1000"),
          col("n_chars"))
        .orderBy("doc_id")
    })

  /** The mixture config the catalog entry pins: a spread of target rates
    * (near-total keep down to total drop), one source absent from the data
    * (exercises the unmatched-config path), and sources absent from the
    * config (exercise the default). The oracle derives its VALUES list from
    * THIS literal, so the two engines can never drift. */
  private[queries] val MixtureWeights: Seq[(String, Long)] = Seq(
    "src0" -> 900000L, "src1" -> 700000L, "src2" -> 500000L,
    "src3" -> 250000L, "src4" -> 100000L, "src17" -> 0L,
    "src_absent" -> 800000L)
  private[queries] val MixtureDefault = 400000L

  private[queries] def mixtureValuesSql: String =
    MixtureWeights.map { case (src, ppm) => s"('$src', $ppm)" }.mkString(", ")

  /** Domain-mixture sampling — the post-curation reweighting stage (the
    * Pile / DoReMi-style mixture step): per-source target keep rates → a
    * deterministic hash-threshold Bernoulli manifest. Delegates to the
    * public [[graft.operators.CorpusCuration.mixtureSample]] operator; the
    * doc-level gate checks every keep decision AND the per-source achieved
    * counts (src_kept/src_total) in one relation. */
  val corpusMixture = QuerySpec(
    "corpus_mixture",
    "domain-mixture sampling: per-source target weights -> deterministic hash-threshold manifest",
    Some(s"""WITH w(source, target_ppm) AS (VALUES $mixtureValuesSql),
            |d AS (SELECT doc_id, doc.source,
            |    COALESCE(w.target_ppm, $MixtureDefault) AS target_ppm,
            |    ${h48Sql("'mx:' || CAST(doc_id AS VARCHAR)")} % 1000000
            |      < COALESCE(w.target_ppm, $MixtureDefault) AS is_kept
            |  FROM documents doc LEFT JOIN w ON w.source = doc.source),
            |s AS (SELECT source,
            |    CAST(SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS src_kept,
            |    CAST(COUNT(*) AS BIGINT) AS src_total
            |  FROM d GROUP BY source)
            |SELECT doc_id, d.source, CAST(target_ppm AS BIGINT) AS target_ppm,
            |  is_kept, src_kept, src_total
            |FROM d JOIN s ON d.source IS NOT DISTINCT FROM s.source
            |ORDER BY doc_id""".stripMargin),
    (s, dir, scope) =>
      graft.operators.CorpusCuration
        .mixtureSample(Tables(s, dir, "documents"), MixtureWeights,
          MixtureDefault, scope = scope)
        .orderBy("doc_id"))

  /** TOKEN-denominated twin of `corpus_budget_select`: real training budgets
    * are tokens, not characters, so the histogram masses each score bucket
    * by the per-doc subword estimate Σ ceil(len(word)/4) (txt_tokens'
    * `n_subword_est` — the vocabulary-free BPE-ish length a pretraining
    * pipeline tracks) and the budget is 40% of total corpus TOKENS. Same
    * sort-free shape: bounded histogram (≤ 1001 rows cross the shuffle),
    * exclusive-prefix cut so the best bucket always survives, broadcast
    * threshold to the corpus-sized filter. */
  val corpusBudgetTokens = QuerySpec(
    "corpus_budget_tokens",
    "token-denominated budget selection: score histogram massed in subword-token estimate",
    Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sc AS (SELECT doc_id, ${TextFunctions.qualityScoreSql} AS score,
            |    ${TextFunctions.subwordTokenEstSql("ws")} AS n_tok
            |  FROM d),
            |b AS (SELECT score, SUM(n_tok) AS toks FROM sc GROUP BY score),
            |r AS (SELECT score,
            |    SUM(toks) OVER (ORDER BY score DESC) - toks AS above FROM b),
            |t AS (SELECT MIN(score) AS tstar FROM r
            |  WHERE above < (SELECT SUM(n_tok) * 2 // 5 FROM sc))
            |SELECT doc_id, CAST(score AS BIGINT) AS score_x1000, n_tok AS n_tokens_est
            |FROM sc, t WHERE sc.score >= t.tstar ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val subwordEst = TextFunctions.subwordTokenEst(col("ws"))
      // feeds the histogram, the budget total, AND the final threshold
      // filter (scope-owned)
      val sc = scope.track(Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("ws")).as("score"),
          subwordEst.as("n_tok")))
      sc.crossJoin(broadcast(histogramThreshold(sc, "n_tok")))
        .filter(col("score") >= col("tstar"))
        .select(col("doc_id"), col("score").as("score_x1000"),
          col("n_tok").as("n_tokens_est"))
        .orderBy("doc_id")
    })

  /** Quota caps for `corpus_mixture_cap`: a cap that binds at every SF
    * (src0 5, default 12 over 25+ docs/source), one that binds only once
    * the corpus outgrows it (src3 1000), total drop (src2 0), an absent
    * source (exercises the unmatched-config path). The oracle derives its
    * VALUES from THIS literal. */
  private val CapWeights: Seq[(String, Long)] = Seq(
    "src0" -> 5L, "src1" -> 40L, "src2" -> 0L, "src3" -> 1000L,
    "src_absent" -> 7L)
  private val CapDefault = 12L

  private def capValuesSql: String =
    CapWeights.map { case (src, cap) => s"('$src', $cap)" }.mkString(", ")

  /** Per-source QUOTA CAP — [[graft.operators.CorpusCuration.quotaCap]]:
    * the third standard mixture form next to rate (`corpus_mixture`) and
    * epochs (`corpus_mixture_epochs`) — "take at most N docs from this
    * source", decided at hash-BUCKET granularity (the sort-free
    * `corpus_budget_select` pattern applied per source: a per-source
    * row_number rank would be a one-reducer sort on the hottest source at
    * 100 TB). The inclusive-prefix threshold guarantees the hard-cap
    * contract — realized take ≤ cap, cap 0 keeps nothing, an under-cap
    * source keeps everything. The gate re-derives the bucket cumsum and
    * threshold independently in DuckDB and checks every keep decision plus
    * the per-source achieved counts. */
  val corpusMixtureCap = QuerySpec(
    "corpus_mixture_cap",
    "per-source quota cap: hash-bucket threshold -> at-most-N deterministic take",
    Some(s"""WITH w(source, cap_docs) AS (VALUES $capValuesSql),
            |d AS (SELECT doc_id, doc.source,
            |    COALESCE(w.cap_docs, $CapDefault) AS cap_docs,
            |    ${h48Sql("'qc:' || CAST(doc_id AS VARCHAR)")} % ${graft.operators.CorpusCuration.QuotaBuckets} AS bkt
            |  FROM documents doc LEFT JOIN w ON w.source = doc.source),
            |b AS (SELECT source, cap_docs, bkt, COUNT(*) AS n
            |  FROM d GROUP BY 1, 2, 3),
            |c AS (SELECT source, cap_docs, bkt,
            |    SUM(n) OVER (PARTITION BY source ORDER BY bkt) AS cum FROM b),
            |t AS (SELECT source, MAX(CASE WHEN cum <= cap_docs THEN bkt END) AS tb
            |  FROM c GROUP BY source),
            |k AS (SELECT d.doc_id, d.source, d.cap_docs,
            |    COALESCE(d.bkt <= t.tb, FALSE) AS is_kept
            |  FROM d JOIN t ON d.source IS NOT DISTINCT FROM t.source),
            |s AS (SELECT source,
            |    CAST(SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS src_kept,
            |    CAST(COUNT(*) AS BIGINT) AS src_total
            |  FROM k GROUP BY source)
            |SELECT doc_id, k.source, CAST(cap_docs AS BIGINT) AS cap_docs,
            |  is_kept, src_kept, src_total
            |FROM k JOIN s ON k.source IS NOT DISTINCT FROM s.source
            |ORDER BY doc_id""".stripMargin),
    (s, dir, scope) =>
      graft.operators.CorpusCuration
        .quotaCap(Tables(s, dir, "documents"), CapWeights, CapDefault,
          scope = scope)
        .orderBy("doc_id"))

  /** Token caps for `corpus_cap_tokens` against per-source subword mass of
    * ~2000 at sf0.01 (~20000 at sf0.1): binding (src0 500, default 800),
    * total drop (src1 0), never-binding (src2 100000), absent source. The
    * oracle derives its VALUES from THIS literal. */
  private val TokenCapWeights: Seq[(String, Long)] = Seq(
    "src0" -> 500L, "src1" -> 0L, "src2" -> 100000L, "src_absent" -> 300L)
  private val TokenCapDefault = 800L

  private def tokenCapValuesSql: String =
    TokenCapWeights.map { case (src, cap) => s"('$src', $cap)" }.mkString(", ")

  /** TOKEN-denominated quota cap — [[graft.operators.CorpusCuration.quotaCapMass]]:
    * `corpus_mixture_cap`'s budget re-denominated in the subword token
    * estimate, the same chars→tokens generalization `corpus_budget_tokens`
    * applies to `corpus_budget_select` (real source quotas are "at most
    * 30B tokens of crawl", not doc counts). Identical sort-free shape —
    * the bucket histogram sums token mass instead of counting rows, and
    * the inclusive-prefix threshold bounds each source's realized take
    * MASS by its cap. */
  val corpusCapTokens = QuerySpec(
    "corpus_cap_tokens",
    "per-source token-mass quota: hash-bucket threshold on summed subword estimate",
    Some(s"""WITH w(source, cap_tokens) AS (VALUES $tokenCapValuesSql),
            |dd AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |d AS (SELECT doc_id, dd.source,
            |    COALESCE(w.cap_tokens, $TokenCapDefault) AS cap_tokens,
            |    ${TextFunctions.subwordTokenEstSql("ws")} AS m,
            |    ${h48Sql("'qc:' || CAST(doc_id AS VARCHAR)")} % ${graft.operators.CorpusCuration.QuotaBuckets} AS bkt
            |  FROM dd LEFT JOIN w ON w.source = dd.source),
            |b AS (SELECT source, cap_tokens, bkt, SUM(m) AS n
            |  FROM d GROUP BY 1, 2, 3),
            |c AS (SELECT source, cap_tokens, bkt,
            |    SUM(n) OVER (PARTITION BY source ORDER BY bkt) AS cum FROM b),
            |t AS (SELECT source, MAX(CASE WHEN cum <= cap_tokens THEN bkt END) AS tb
            |  FROM c GROUP BY source),
            |k AS (SELECT d.doc_id, d.source, d.cap_tokens, d.m,
            |    COALESCE(d.bkt <= t.tb, FALSE) AS is_kept
            |  FROM d JOIN t ON d.source IS NOT DISTINCT FROM t.source),
            |s AS (SELECT source,
            |    CAST(SUM(CASE WHEN is_kept THEN m ELSE 0 END) AS BIGINT) AS src_kept,
            |    CAST(SUM(m) AS BIGINT) AS src_total
            |  FROM k GROUP BY source)
            |SELECT doc_id, k.source, CAST(cap_tokens AS BIGINT) AS cap_tokens,
            |  is_kept, src_kept, src_total
            |FROM k JOIN s ON k.source IS NOT DISTINCT FROM s.source
            |ORDER BY doc_id""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      graft.operators.CorpusCuration
        .quotaCapMass(docs, TextFunctions.subwordTokenEst(col("ws")),
          TokenCapWeights, TokenCapDefault, scope = scope)
        .withColumnRenamed("cap_mass", "cap_tokens")
        .orderBy("doc_id")
    })

  /** Epoch weights for `corpus_mixture_epochs`: whole + fractional
    * upsampling, exact one-pass, downsample, total drop, an absent source,
    * and sources left to the 1.5-epoch default. The oracle derives its
    * VALUES from THIS literal. */
  private val EpochWeights: Seq[(String, Long)] = Seq(
    "src0" -> 3500000L, "src1" -> 1000000L, "src2" -> 2000000L,
    "src3" -> 600000L, "src17" -> 0L, "src_absent" -> 5000000L)
  private val EpochDefault = 1500000L

  private def epochValuesSql: String =
    EpochWeights.map { case (src, ppm) => s"('$src', $ppm)" }.mkString(", ")

  /** Mixture with UPSAMPLING — [[graft.operators.CorpusCuration.mixtureEpochs]]:
    * epochs in ppm of one pass (3_500_000 = 3.5 epochs), whole epochs
    * emitted unconditionally, the fractional copy decided by the same
    * hash-threshold law as `corpus_mixture`. One output row per emitted
    * COPY with its 0-based `copy_idx`, plus per-source realized-epoch
    * accounting. The gate checks the copy expansion doc-for-doc: DuckDB
    * re-derives n_copies and unnests its own series. */
  val corpusMixtureEpochs = QuerySpec(
    "corpus_mixture_epochs",
    "mixture with upsampling: fractional epochs per source -> deterministic copy expansion",
    Some(s"""WITH w(source, target_ppm) AS (VALUES $epochValuesSql),
            |d AS (SELECT doc_id, doc.source,
            |    COALESCE(w.target_ppm, $EpochDefault) AS target_ppm,
            |    COALESCE(w.target_ppm, $EpochDefault) // 1000000 +
            |      CASE WHEN ${h48Sql("'mx:' || CAST(doc_id AS VARCHAR)")} % 1000000
            |        < COALESCE(w.target_ppm, $EpochDefault) % 1000000
            |      THEN 1 ELSE 0 END AS n_copies
            |  FROM documents doc LEFT JOIN w ON w.source = doc.source),
            |s AS (SELECT source, CAST(SUM(n_copies) AS BIGINT) AS src_emitted,
            |    CAST(COUNT(*) AS BIGINT) AS src_total
            |  FROM d GROUP BY source),
            |x AS (SELECT doc_id, source, target_ppm,
            |    UNNEST(GENERATE_SERIES(0, n_copies - 1)) AS copy_idx
            |  FROM d WHERE n_copies > 0)
            |SELECT doc_id, x.source, CAST(target_ppm AS BIGINT) AS target_ppm,
            |  CAST(copy_idx AS BIGINT) AS copy_idx, src_emitted, src_total
            |FROM x JOIN s ON x.source IS NOT DISTINCT FROM s.source
            |ORDER BY doc_id, copy_idx""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      graft.operators.CorpusCuration
        .mixtureEpochs(Tables(s, dir, "documents"), EpochWeights,
          EpochDefault, scope = scope)
        .select(col("doc_id"), col("source"), col("target_ppm"),
          col("copy").as("copy_idx"), col("src_emitted"), col("src_total"))
        .orderBy("doc_id", "copy_idx")
    })

  /** The FULL pretraining-corpus build in one declarative plan — what a
    * training-data team actually runs end to end, composed from the
    * library's public stages:
    *
    *   1. curation ([[graft.operators.CorpusCuration.manifest]]) — keep
    *      only `status = 'kept'` docs (quality + dedup + contamination);
    *   2. domain mixture ([[graft.operators.CorpusCuration.mixtureDecisions]],
    *      the decide-only form of mixtureSample) over the kept set —
    *      per-source hash-threshold Bernoulli;
    *   3. budget selection ([[histogramThreshold]]) — 40% of the
    *      post-mixture char mass via the bounded score histogram;
    *   4. shard accounting — portable-hash shard assignment with per-shard
    *      doc/char/id_sum fingerprints (≤ 16 output rows, so one wrong doc
    *      ANYWHERE upstream fails the hash gate).
    *
    * Scale shape: exactly ONE scan reads the text column (the manifest's
    * fused score+grams projection — PlanSpec pins it on pipeline_corpus),
    * and it is paid entirely inside the curation stage: the kept set is a
    * scope-owned `localCheckpoint` — the curation→selection STAGE BOUNDARY,
    * exactly where a production run materializes between stages (a table
    * write on a real cluster) — so the selection plan runs off a leaf,
    * re-reads no text (PlanSpec-pinned), and the analyzer never re-walks
    * the manifest tree once per downstream reference (which measured
    * 10.5s → 4.3s at sf0.01). Survivors persist under the caller's scope
    * (histogram + budget + filter branches). The mixture config reuses
    * `corpus_mixture`'s literal, so its oracle VALUES cannot drift. */
  val pipelinePretrain = QuerySpec(
    "pipeline_pretrain",
    "full pretraining build: curation -> mixture -> budget-select -> shard accounting, one plan",
    Some(s"""WITH RECURSIVE $manifestCtes,
            |w(source, target_ppm) AS (VALUES $mixtureValuesSql),
            |keptd AS (SELECT st.doc_id, st.score, d.source, d.n_chars
            |  FROM st JOIN documents d ON d.doc_id = st.doc_id
            |  WHERE st.status = 'kept'),
            |mx AS (SELECT k.doc_id, k.score, k.n_chars,
            |    ${h48Sql("'mx:' || CAST(k.doc_id AS VARCHAR)")} % 1000000
            |      < COALESCE(w.target_ppm, $MixtureDefault) AS mix_kept
            |  FROM keptd k LEFT JOIN w ON w.source = k.source),
            |surv AS (SELECT doc_id, score, n_chars FROM mx WHERE mix_kept),
            |b AS (SELECT score, SUM(n_chars) AS chars FROM surv GROUP BY score),
            |r AS (SELECT score,
            |    SUM(chars) OVER (ORDER BY score DESC) - chars AS above FROM b),
            |th AS (SELECT MIN(score) AS tstar FROM r
            |  WHERE above < (SELECT SUM(n_chars) * 2 // 5 FROM surv)),
            |sel AS (SELECT doc_id, n_chars,
            |    ${h48Sql("'sh:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard
            |  FROM surv, th WHERE surv.score >= th.tstar)
            |SELECT CAST(shard AS BIGINT) AS shard,
            |  CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
            |FROM sel GROUP BY shard ORDER BY shard""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      // CHECKPOINTED, not just persisted: this is the curation→selection
      // stage boundary (where a production run materializes between
      // stages), and every downstream branch references it — truncating
      // the lineage to a leaf here both guarantees the manifest chain
      // (LSH, components) computes exactly once and keeps the analyzer
      // from re-walking its giant tree once per reference (measured 10.5s
      // → ~4s at sf0.01)
      val kept = scope.checkpoint(
        graft.operators.CorpusCuration.manifest(docs, scope = scope)
          .filter(col("status") === "kept")
          .select(col("doc_id"), col("score_x1000").as("score"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id"))
      // decide-only (no achieved-count machinery, which Catalyst could not
      // prune); decisions PASS THROUGH kept's columns, so the survivor set needs
      // no re-join — one broadcast config join + filter off the checkpoint
      // leaf. Persisted: feeds the histogram, the budget, and the filter.
      val surv = scope.track(graft.operators.CorpusCuration
        .mixtureDecisions(kept, MixtureWeights, MixtureDefault)
        .filter(col("is_kept"))
        .select(col("doc_id"), col("score"), col("n_chars")))
      val shard = graft.functions.PortableHash
        .h48(concat(lit("sh:"), col("doc_id").cast("string"))) % 16
      surv.crossJoin(broadcast(histogramThreshold(surv, "n_chars")))
        .filter(col("score") >= col("tstar"))
        .select(col("doc_id"), col("n_chars"), shard.as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          sum("doc_id").as("id_sum"))
        .orderBy("shard")
    })

  /** The full build with UPSAMPLING composed in — `pipeline_pretrain`'s
    * missing half: a real mixture weights small high-quality sources ABOVE
    * 1× (the "3.5 epochs of Wikipedia" pattern), so the mixture stage here
    * is the epoch COPY EXPANSION ([[graft.operators.CorpusCuration.epochCopies]],
    * the decide-only form of mixtureEpochs), not a keep/drop Bernoulli:
    *
    *   curation → epoch expansion (whole copies + hash-law fractional
    *   copy, map-side explode) → char-budget selection over EMITTED
    *   copies (an upsampled doc weighs n_copies× in the histogram — the
    *   budget is training mass, not unique docs) → shard accounting with
    *   copies SPREAD by h48(sh:doc_id:copy), so a doc's epochs land in
    *   different shards (same-shard epochs would co-locate duplicate text
    *   in one training file).
    *
    * Scale shape inherited from `pipeline_pretrain`: one text scan inside
    * curation, scope-owned checkpoint at the stage boundary, broadcast
    * config join + bounded-fanout explode (≤ ⌈max ppm/1e6⌉ per doc, 64-
    * epoch cap), ≤1001-row histogram exchange, ≤16-row output whose
    * id/copy sums fingerprint every upstream decision. */
  val pipelinePretrainEpochs = QuerySpec(
    "pipeline_pretrain_epochs",
    "full pretraining build with upsampling: curation -> epoch copy expansion -> budget -> sharding",
    Some(s"""WITH RECURSIVE $manifestCtes,
            |w(source, target_ppm) AS (VALUES $epochValuesSql),
            |keptd AS (SELECT st.doc_id, st.score, d.source, d.n_chars
            |  FROM st JOIN documents d ON d.doc_id = st.doc_id
            |  WHERE st.status = 'kept'),
            |mx AS (SELECT k.doc_id, k.score, k.n_chars,
            |    COALESCE(w.target_ppm, $EpochDefault) // 1000000 +
            |      CASE WHEN ${h48Sql("'mx:' || CAST(k.doc_id AS VARCHAR)")} % 1000000
            |        < COALESCE(w.target_ppm, $EpochDefault) % 1000000
            |      THEN 1 ELSE 0 END AS n_copies
            |  FROM keptd k LEFT JOIN w ON w.source = k.source),
            |x AS (SELECT doc_id, score, n_chars,
            |    UNNEST(GENERATE_SERIES(0, n_copies - 1)) AS copy
            |  FROM mx WHERE n_copies > 0),
            |b AS (SELECT score, SUM(n_chars) AS chars FROM x GROUP BY score),
            |r AS (SELECT score,
            |    SUM(chars) OVER (ORDER BY score DESC) - chars AS above FROM b),
            |th AS (SELECT MIN(score) AS tstar FROM r
            |  WHERE above < (SELECT SUM(n_chars) * 2 // 5 FROM x)),
            |sel AS (SELECT doc_id, copy, n_chars,
            |    ${h48Sql("'sh:' || CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)")} % 16 AS shard
            |  FROM x, th WHERE x.score >= th.tstar)
            |SELECT CAST(shard AS BIGINT) AS shard,
            |  CAST(COUNT(*) AS BIGINT) AS n_copies,
            |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
            |  CAST(SUM(copy) AS BIGINT) AS copy_sum
            |FROM sel GROUP BY shard ORDER BY shard""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      // same stage-boundary checkpoint as pipeline_pretrain (see there)
      val kept = scope.checkpoint(
        graft.operators.CorpusCuration.manifest(docs, scope = scope)
          .filter(col("status") === "kept")
          .select(col("doc_id"), col("score_x1000").as("score"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id"))
      // decide-only epoch law: score/n_chars PASS THROUGH the broadcast
      // config join, the bounded explode emits one row per copy off the
      // checkpoint leaf. Persisted: feeds histogram, budget, and filter.
      val surv = scope.track(graft.operators.CorpusCuration
        .epochCopies(kept, EpochWeights, EpochDefault)
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("score"), col("n_chars"),
          explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy")))
      val shard = graft.functions.PortableHash
        .h48(concat(lit("sh:"), col("doc_id").cast("string"), lit(":"),
          col("copy").cast("string"))) % 16
      surv.crossJoin(broadcast(histogramThreshold(surv, "n_chars")))
        .filter(col("score") >= col("tstar"))
        .select(col("doc_id"), col("copy"), col("n_chars"), shard.as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_copies"), sum("n_chars").as("total_chars"),
          sum("doc_id").as("id_sum"), sum("copy").as("copy_sum"))
        .orderBy("shard")
    })

  /** Curation → mixture → SEQUENCE PACKING in one plan: the literal last
    * mile — from raw corpus to the per-(shard, window) layout a trainer
    * reads — composed from the same public stages. The packing unit here
    * is CHARS (n_chars rides the manifest join), keeping the build's
    * one-text-scan property: re-deriving the subword estimate would read
    * `text` a second time, and the packing law is unit-agnostic
    * (`corpus_pack_*` gate the token-denominated form). Window capacity
    * 1024 chars ≈ 3 curated docs. Scale shape: the packing stage adds ONE
    * hash exchange on shard + an in-partition sort over the SURVIVOR set
    * (already a fraction of the corpus), with per-window output rows
    * bounded by corpus_mass / 1024. */
  val pipelinePack = QuerySpec(
    "pipeline_pack",
    "curation -> mixture -> per-shard sequence packing accounting, one plan",
    Some(s"""WITH RECURSIVE $manifestCtes,
            |cfg(source, target_ppm) AS (VALUES $mixtureValuesSql),
            |keptd AS (SELECT st.doc_id, d.source, d.n_chars
            |  FROM st JOIN documents d ON d.doc_id = st.doc_id
            |  WHERE st.status = 'kept'),
            |mx AS (SELECT k.doc_id, k.n_chars AS n_tok
            |  FROM keptd k LEFT JOIN cfg ON cfg.source = k.source
            |  WHERE ${h48Sql("'mx:' || CAST(k.doc_id AS VARCHAR)")} % 1000000
            |    < COALESCE(cfg.target_ppm, $MixtureDefault)),
            |${PackingQueries.packWindowCtes("mx")},
            |${PackingQueries.packStatsSql(1024L)}""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      // same stage-boundary checkpoint as pipeline_pretrain (see there)
      val kept = scope.checkpoint(
        graft.operators.CorpusCuration.manifest(docs, scope = scope)
          .filter(col("status") === "kept")
          .select(col("doc_id"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id"))
      val surv = graft.operators.CorpusCuration
        .mixtureDecisions(kept, MixtureWeights, MixtureDefault)
        .filter(col("is_kept"))
        .select(col("doc_id"), col("n_chars").as("n_tok"))
      graft.operators.SequencePacking
        .packStats(surv, "n_tok", seqLen = 1024L, shards = 16)
        .orderBy("shard", "seq_id")
    })

  val OrderShards = 64
  private val OrderedSeqLen = 1024L

  /** Curation → mixture → GLOBAL-ORDER packing, one plan — the end-to-end
    * chain `pipeline_pack` leaves open: pipeline_pack packs survivors
    * per-shard in pack-hash order (16 independent output files), while
    * `corpus_order` computes the reproducible global training permutation;
    * this entry packs the survivor set in THAT order — the single
    * concatenated token stream a sequential dataloader consumes, chunked
    * into global 1024-token windows.
    *
    * No global sort appears anywhere: the global position decomposes
    * exactly as corpus_order's two levels — per-shard parallel prefix
    * sums over (hk, doc_id) order, plus an exclusive prefix over the
    * ≤[[OrderShards]]-row per-shard TOKEN totals broadcast back
    * (corpus_order prefixes doc counts; packing prefixes token mass —
    * same bounded machinery). Windows may span shard boundaries (a
    * shard's token total is not a multiple of the window), which the
    * global seq_id aggregation merges map-side-combined; output row count
    * is corpus_token_mass / 1024, same as pipeline_pack's. Shares the
    * manifest+mixture CTEs with pipeline_pack and the offset CTEs with
    * corpus_order. */
  val pipelinePackOrdered = QuerySpec(
    "pipeline_pack_ordered",
    "curation -> mixture -> packing in the global training order (broadcast offsets, no global sort)",
    Some(s"""WITH RECURSIVE $manifestCtes,
            |cfg(source, target_ppm) AS (VALUES $mixtureValuesSql),
            |keptd AS (SELECT st.doc_id, d.source, d.n_chars
            |  FROM st JOIN documents d ON d.doc_id = st.doc_id
            |  WHERE st.status = 'kept'),
            |mx AS (SELECT k.doc_id, k.n_chars AS n_tok
            |  FROM keptd k LEFT JOIN cfg ON cfg.source = k.source
            |  WHERE ${h48Sql("'mx:' || CAST(k.doc_id AS VARCHAR)")} % 1000000
            |    < COALESCE(cfg.target_ppm, $MixtureDefault)),
            |po_mk AS (SELECT doc_id, n_tok,
            |    ${h48Sql("'ord:' || CAST(doc_id AS VARCHAR)")} AS hk
            |  FROM mx WHERE n_tok > 0),
            |po_p AS (SELECT doc_id, n_tok, hk, hk % $OrderShards AS shard,
            |    CAST(SUM(n_tok) OVER (PARTITION BY hk % $OrderShards
            |      ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS lb
            |  FROM po_mk),
            |po_c AS (SELECT shard, CAST(SUM(n_tok) AS BIGINT) AS t FROM po_p GROUP BY shard),
            |po_o AS (SELECT shard, CAST(SUM(t) OVER (ORDER BY shard) - t AS BIGINT) AS toff FROM po_c),
            |po_g AS (SELECT p.doc_id, p.n_tok, o.toff + p.lb AS cb
            |  FROM po_p p JOIN po_o o ON o.shard = p.shard),
            |po_x AS (SELECT cb, n_tok,
            |    UNNEST(GENERATE_SERIES(cb // $OrderedSeqLen, (cb + n_tok - 1) // $OrderedSeqLen)) AS seq_id
            |  FROM po_g)
            |SELECT CAST(seq_id AS BIGINT) AS seq_id,
            |  CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(CASE WHEN cb >= seq_id * $OrderedSeqLen THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_started,
            |  CAST(SUM(LEAST(cb + n_tok, (seq_id + 1) * $OrderedSeqLen)
            |    - GREATEST(cb, seq_id * $OrderedSeqLen)) AS BIGINT) AS n_tokens,
            |  SUM(LEAST(cb + n_tok, (seq_id + 1) * $OrderedSeqLen)
            |    - GREATEST(cb, seq_id * $OrderedSeqLen)) = $OrderedSeqLen AS is_full
            |FROM po_x GROUP BY seq_id ORDER BY seq_id""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val kept = scope.checkpoint(
        graft.operators.CorpusCuration.manifest(docs, scope = scope)
          .filter(col("status") === "kept")
          .select(col("doc_id"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id"))
      val surv = graft.operators.CorpusCuration
        .mixtureDecisions(kept, MixtureWeights, MixtureDefault)
        .filter(col("is_kept"))
        .select(col("doc_id"), col("n_chars").cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
      val hk = graft.functions.PortableHash
        .h48(concat(lit("ord:"), col("doc_id").cast("string")))
      val sw = Window.partitionBy("shard").orderBy(col("hk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = surv.withColumn("hk", hk)
        .withColumn("shard", col("hk") % OrderShards)
        .withColumn("lb", (sum("n_tok").over(sw) - col("n_tok")).cast("long"))
      val off = p.groupBy("shard").agg(sum("n_tok").as("t"))
        .withColumn("toff", (sum("t").over(Window.orderBy("shard")) - col("t"))
          .cast("long"))
        .select(col("shard"), col("toff"))
      p.join(broadcast(off), "shard")
        .select(col("n_tok"), (col("toff") + col("lb")).as("cb"))
        .select(col("cb"), col("n_tok"),
          explode(sequence(expr(s"cb div ${OrderedSeqLen}L"),
            expr(s"(cb + n_tok - 1) div ${OrderedSeqLen}L"))).as("seq_id"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cb") >= col("seq_id") * OrderedSeqLen, 1L)
            .otherwise(0L)).as("n_docs_started"),
          sum(least(col("cb") + col("n_tok"),
              (col("seq_id") + 1) * OrderedSeqLen)
            - greatest(col("cb"), col("seq_id") * OrderedSeqLen))
            .as("n_tokens"))
        .withColumn("is_full", col("n_tokens") === OrderedSeqLen)
        .orderBy("seq_id")
    })

  /** CORPUS-VERSION DIFF — the build-to-build audit a training-data team
    * runs when the crawl grows: curate YESTERDAY's corpus (the deterministic
    * `doc_id % 5 <> 4` slice) and TODAY's (the full table) independently,
    * then emit the STATUS-TRANSITION MATRIX (status_v1 × status_v2 with doc
    * counts and id_sum membership fingerprints — ≤ |status|² ≈ 36 rows, so
    * one doc flipping its reason anywhere fails the hash gate). The
    * interesting content is exactly the engine's stability story made
    * auditable: per-doc laws (quality score, benchmark slice, split hash)
    * CANNOT flip when the corpus around a doc changes, so every
    * off-diagonal row must come from the corpus-DEPENDENT stages — a new
    * near-duplicate arriving demotes yesterday's keeper ('kept' →
    * 'duplicate'), a new benchmark-sliced doc contaminates an old one
    * ('kept' → 'contaminated') — plus the 'absent' → * column for new
    * docs.
    *
    * Scale shape: at 100 TB a team diffs yesterday's MATERIALIZED manifest
    * against today's run (one curation + one join); the entry computes
    * both sides to stay self-contained, and the diff itself is one
    * doc_id-keyed full-outer join collapsing straight into a ≤36-row
    * aggregate. The oracle instantiates the whole recursive manifest chain
    * TWICE under CTE prefixes and re-derives the same matrix. */
  val corpusDiff = QuerySpec(
    "corpus_diff",
    "corpus-version diff: two curation runs -> status-transition matrix with id_sum fingerprints",
    Some(s"""WITH RECURSIVE ${manifestCtes(None, "(SELECT * FROM documents WHERE doc_id % 5 <> 4) AS v1docs", "v1_")},
            |${manifestCtes(None, "documents", "v2_")},
            |dx AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
            |    COALESCE(a.status, 'absent') AS status_v1,
            |    COALESCE(b.status, 'absent') AS status_v2
            |  FROM v1_st a FULL JOIN v2_st b ON a.doc_id = b.doc_id)
            |SELECT status_v1, status_v2, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
            |FROM dx GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      // The two curation runs are INDEPENDENT, and each executes its
      // duplicate-resolution star-contraction loop EAGERLY at build — a
      // sequence of small convergence jobs that leaves most of the cluster
      // idle in its tail. Building them on two driver threads lets the
      // scheduler back-fill one run's tail with the other's jobs (the
      // guide's overlap-independent-jobs rule); results are unchanged —
      // both plans are pure functions of the corpus, and FIFO scheduling
      // keeps the first run's stages prioritized exactly as before.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val (v1, v2) = try {
        val fv1 = pool.submit(new java.util.concurrent.Callable[DataFrame] {
          def call(): DataFrame = graft.operators.CorpusCuration
            .manifest(docs.filter(col("doc_id") % 5 =!= 4), scope = scope)
            .select(col("doc_id"), col("status").as("status_v1"))
        })
        val fv2 = pool.submit(new java.util.concurrent.Callable[DataFrame] {
          def call(): DataFrame = graft.operators.CorpusCuration
            .manifest(docs, scope = scope)
            .select(col("doc_id"), col("status").as("status_v2"))
        })
        (fv1.get(), fv2.get())
      } finally pool.shutdown()
      v1.join(v2, Seq("doc_id"), "full")
        .select(col("doc_id"),
          coalesce(col("status_v1"), lit("absent")).as("status_v1"),
          coalesce(col("status_v2"), lit("absent")).as("status_v2"))
        .groupBy("status_v1", "status_v2")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
        .orderBy("status_v1", "status_v2")
    })

  /** The PRODUCTION shape of [[corpusDiff]] — diff against a MATERIALIZED
    * v1 manifest, the form the corpus_diff scaladoc itself documents: v1's
    * manifest is written to parquet ONCE (provenance-keyed staging, the
    * sink_partitioned pattern — the staged copy cannot outlive the corpus
    * file it derives from), and the entry then runs ONE curation (today's)
    * plus a doc_id-keyed full-outer join against the stored file. Halves
    * the self-contained twin's cost — which made corpus_diff the
    * catalog's most expensive entry — and exercises the
    * manifest-sink → manifest-source round trip end-to-end. The stored v1
    * is bit-identical to a freshly computed one (curation is
    * deterministic), so this entry shares corpus_diff's oracle and must
    * hash identically to it — the emb_coreset_inc same-oracle pattern. */
  val corpusDiffStored = QuerySpec(
    "corpus_diff_stored",
    "corpus diff against a materialized v1 manifest — same oracle as corpus_diff",
    corpusDiff.oracle,
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      val stage = Staging.dir("staged-manifestv1",
        Staging.provenanceKey(dir, "documents")) { p =>
        graft.operators.CorpusCuration
          .manifest(docs.filter(col("doc_id") % 5 =!= 4), scope = scope)
          .select(col("doc_id"), col("status"))
          .write.mode("overwrite").parquet(p.toString)
      }
      val v1 = s.read.parquet(stage.toString)
        .select(col("doc_id"), col("status").as("status_v1"))
      val v2 = graft.operators.CorpusCuration.manifest(docs, scope = scope)
        .select(col("doc_id"), col("status").as("status_v2"))
      v1.join(v2, Seq("doc_id"), "full")
        .select(col("doc_id"),
          coalesce(col("status_v1"), lit("absent")).as("status_v1"),
          coalesce(col("status_v2"), lit("absent")).as("status_v2"))
        .groupBy("status_v1", "status_v2")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
        .orderBy("status_v1", "status_v2")
    })

  /** Deterministic global training order — the "shuffle the corpus once,
    * reproducibly" stage between curation and the trainer: every doc gets a
    * GLOBAL position in a hash-shuffled order, computed WITHOUT a global
    * sort. The naive form (ROW_NUMBER over ORDER BY hash) is a
    * single-reducer sort at 100 TB; here the order is two-level, the
    * standard distributed external-sort decomposition:
    *
    *   1. shard = h48('ord:'doc_id) % [[OrderShards]] — a deterministic
    *      hash partition of the corpus;
    *   2. local_pos: ROW_NUMBER within each shard ordered by (hash,
    *      doc_id) — [[OrderShards]]-way parallel sorts of corpus/shards
    *      rows each;
    *   3. global_pos = shard_offset + local_pos − 1, where the offsets are
    *      an exclusive prefix sum over the BOUNDED per-shard count table
    *      (≤ [[OrderShards]] rows cross that shuffle) broadcast back.
    *
    * Because shard AND within-shard order both derive from the same
    * per-doc hash, the composite order is exactly "order by (hash,
    * doc_id)" — a true deterministic permutation, identical on any
    * cluster, any partitioning, any engine. 64 shards match this harness;
    * a 1000-executor run raises OrderShards (it only changes which
    * permutation is produced, not any property of it) so each shard's sort
    * fits one task. Epoch reshuffles are the same plan with a different
    * salt. (OrderShards itself is declared above `pipeline_pack_ordered`,
    * which interpolates it into its oracle — object vals initialize in
    * declaration order.) */
  val corpusOrder = QuerySpec(
    "corpus_order",
    "deterministic global training order: two-level hash shuffle, no global sort",
    Some(s"""WITH h AS (SELECT doc_id,
            |    ${h48Sql("'ord:' || CAST(doc_id AS VARCHAR)")} AS hk
            |  FROM documents),
            |p AS (SELECT doc_id, hk, hk % $OrderShards AS shard,
            |    ROW_NUMBER() OVER (PARTITION BY hk % $OrderShards
            |      ORDER BY hk, doc_id) AS local_pos
            |  FROM h),
            |c AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n
            |  FROM p GROUP BY shard),
            |o AS (SELECT shard, SUM(n) OVER (ORDER BY shard) - n AS off FROM c)
            |SELECT p.doc_id, CAST(p.shard AS BIGINT) AS shard,
            |  CAST(p.local_pos AS BIGINT) AS local_pos,
            |  CAST(o.off + p.local_pos - 1 AS BIGINT) AS global_pos
            |FROM p JOIN o ON o.shard = p.shard ORDER BY p.doc_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val hk = graft.functions.PortableHash
        .h48(concat(lit("ord:"), col("doc_id").cast("string")))
      val p = Tables(s, dir, "documents")
        .select(col("doc_id"), hk.as("hk"))
        .withColumn("shard", col("hk") % OrderShards)
        .withColumn("local_pos", row_number()
          .over(Window.partitionBy("shard").orderBy(col("hk"), col("doc_id")))
          .cast("long"))
      val off = p.groupBy("shard").agg(count(lit(1)).as("n"))
        .withColumn("off",
          sum("n").over(Window.orderBy("shard")) - col("n"))
        .select(col("shard"), col("off"))
      p.join(broadcast(off), "shard")
        .select(col("doc_id"), col("shard").cast("long").as("shard"),
          col("local_pos"),
          (col("off") + col("local_pos") - 1).cast("long").as("global_pos"))
        .orderBy("doc_id")
    })

  /** ANNEALING / CURRICULUM training order — the quality-staged variant of
    * [[corpusOrder]] every recent public recipe runs (the "save the best
    * data for the end of training" mid-training/annealing practice):
    * documents are ordered BAND-MAJOR by quality — low-quality bands
    * first, the highest-quality band last, so the final training steps see
    * the best data — with [[corpusOrder]]'s deterministic hash shuffle
    * WITHIN each band. The decomposition is the same two-level machinery
    * one level deeper: within-(band, shard) parallel sorts, plus an
    * exclusive prefix over the ≤ bands×[[OrderShards]]-row per-(band,
    * shard) count table in (band, shard) order broadcast back — the
    * corpus never globally sorts, and the composite order is exactly
    * "order by (band, hash, doc_id)". Bands are the score quartile-ish
    * cut score_x1000 div 250 (≤ 5 values by the score law's [0, 1000]
    * range); a production recipe swaps in its own band function — only
    * the band expression changes, no property of the plan. */
  val corpusOrderCurriculum = QuerySpec(
    "corpus_order_curriculum",
    "annealing curriculum order: quality-band-major, hash-shuffled within band, no global sort",
    Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |h AS (SELECT doc_id,
            |    COALESCE(${TextFunctions.qualityScoreSql}, -250) // 250 AS band,
            |    ${h48Sql("'ord:' || CAST(doc_id AS VARCHAR)")} AS hk
            |  FROM d),
            |p AS (SELECT doc_id, band, hk, hk % $OrderShards AS shard,
            |    ROW_NUMBER() OVER (PARTITION BY band, hk % $OrderShards
            |      ORDER BY hk, doc_id) AS local_pos
            |  FROM h),
            |c AS (SELECT band, shard, CAST(COUNT(*) AS BIGINT) AS n
            |  FROM p GROUP BY band, shard),
            |o AS (SELECT band, shard, SUM(n) OVER (ORDER BY band, shard) - n AS off
            |  FROM c)
            |SELECT p.doc_id, CAST(p.band AS BIGINT) AS band,
            |  CAST(p.shard AS BIGINT) AS shard,
            |  CAST(p.local_pos AS BIGINT) AS local_pos,
            |  CAST(o.off + p.local_pos - 1 AS BIGINT) AS global_pos
            |FROM p JOIN o ON o.band = p.band AND o.shard = p.shard
            |ORDER BY p.doc_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val hk = graft.functions.PortableHash
        .h48(concat(lit("ord:"), col("doc_id").cast("string")))
      // null text scores null: coalesce to -250 (band -1, ordered first —
      // a null band would sort NULLS FIRST in Spark but NULLS LAST in
      // DuckDB, silently diverging the offsets)
      val band = call_function("div",
        coalesce(TextFunctions.qualityScore(split(col("text"), " ")),
          lit(-250L)), lit(250L))
      val p = Tables(s, dir, "documents")
        .select(col("doc_id"), band.as("band"), hk.as("hk"))
        .withColumn("shard", col("hk") % OrderShards)
        .withColumn("local_pos", row_number()
          .over(Window.partitionBy("band", "shard")
            .orderBy(col("hk"), col("doc_id")))
          .cast("long"))
      val off = p.groupBy("band", "shard").agg(count(lit(1)).as("n"))
        .withColumn("off",
          sum("n").over(Window.orderBy("band", "shard")) - col("n"))
        .select(col("band"), col("shard"), col("off"))
      p.join(broadcast(off), Seq("band", "shard"))
        .select(col("doc_id"), col("band").cast("long").as("band"),
          col("shard").cast("long").as("shard"), col("local_pos"),
          (col("off") + col("local_pos") - 1).cast("long").as("global_pos"))
        .orderBy("doc_id")
    })

  /** PER-SOURCE percentile selection — the quality-calibration step the
    * flat `corpus_budget_select` cannot express: raw quality scores are not
    * comparable ACROSS domains (a median academic doc outscores a good
    * forum post), so production recipes take quantiles WITHIN each source
    * and keep its top fraction — every domain survives at its own
    * calibrated bar instead of the corpus-wide threshold silently deleting
    * whole domains. Same sort-free machinery as `corpus_budget_select`,
    * keyed: the (source, score) doc-count histogram partial-aggregates to
    * ≤ n_sources × 1001 rows, the per-source exclusive-prefix cut runs as
    * a window over that bounded table, and the ≤ n_sources-row threshold
    * table joins back broadcast — the corpus never sorts, never shuffles
    * beyond the histogram's partial aggregation. The budget is
    * max(1, 30% of the source's docs): the floor keeps the best bucket
    * even for tiny sources (the exclusive prefix makes it the bucket with
    * `above = 0`), so no source ever calibrates itself to zero.
    *
    * Scale note: `source` here is the mixture-class key (the SAME bounded
    * keyspace as [[MixtureWeights]] — tens to thousands of classes), so
    * the histogram and threshold tables are bounded. For a raw-domain key
    * (millions of values) the identical plan holds but the threshold join
    * degrades broadcast → shuffle, and a production run would bucket
    * domains into classes first — which is exactly what mixture configs
    * do. */
  val corpusSelectPerSource = QuerySpec(
    "corpus_select_persource",
    "per-source percentile quality gate: top 30% of docs within each source",
    Some(s"""WITH d AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |sc AS (SELECT doc_id, source, ${TextFunctions.qualityScoreSql} AS score FROM d),
            |b AS (SELECT source, score, COUNT(*) AS n FROM sc GROUP BY source, score),
            |r AS (SELECT source, score,
            |    SUM(n) OVER (PARTITION BY source ORDER BY score DESC) - n AS above FROM b),
            |bud AS (SELECT source, GREATEST(1, COUNT(*) * 3 // 10) AS budget
            |  FROM sc GROUP BY source),
            |t AS (SELECT r.source, MIN(r.score) AS tstar
            |  FROM r JOIN bud ON bud.source = r.source
            |  WHERE r.above < bud.budget GROUP BY r.source)
            |SELECT sc.doc_id, sc.source, CAST(sc.score AS BIGINT) AS score_x1000,
            |  CAST(t.tstar AS BIGINT) AS tstar
            |FROM sc JOIN t ON t.source = sc.source
            |WHERE sc.score >= t.tstar ORDER BY sc.doc_id""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      // feeds the histogram AND the final threshold filter (scope-owned)
      val sc = scope.track(Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("ws")).as("score")))
      val hist = sc.groupBy("source", "score").agg(count(lit(1)).as("n"))
        .withColumn("above",
          sum("n").over(Window.partitionBy("source").orderBy(col("score").desc))
            - col("n"))
      val budgets = sc.groupBy("source")
        .agg(greatest(lit(1L), expr("count(1) * 3 div 10")).as("budget"))
      val thresholds = hist.join(budgets, "source")
        .filter(col("above") < col("budget"))
        .groupBy("source").agg(min("score").as("tstar"))
      sc.join(Broadcasting.maybeBroadcast(thresholds), "source")
        .filter(col("score") >= col("tstar"))
        .select(col("doc_id"), col("source"), col("score").as("score_x1000"),
          col("tstar").cast("long").as("tstar"))
        .orderBy("doc_id")
    })

  /** TEMPERATURE-BASED mixture derivation — where `MixtureWeights` COMES
    * FROM: the α-sampling law multilingual/multi-domain pretraining uses
    * to set per-source rates from OBSERVED sizes (p_s ∝ mass_s^α with
    * α < 1 upsampling low-resource sources — XLM-R's α=0.3, mT5's 0.3;
    * α=0.5 here because it is EXACTLY integer-portable: mass^0.5 =
    * floor(sqrt(token_mass)), the same floor-sqrt both engines already
    * agree on for the shingle-df cap). `corpus_mixture` and the manifest
    * pipelines APPLY configured ppm targets; this entry is the config
    * GENERATION stage that turns a crawl's measured per-source token
    * masses into those targets, emitted beside the proportional share so
    * the output shows each source's upsampling boost directly.
    *
    * Scale shape: one corpus scan → per-source token-mass aggregation
    * (map-side partials, ≤ |sources| rows cross the shuffle), a cached
    * ≤|sources|-row weight table feeding both the totals and the output,
    * and a broadcast 1-row totals join. Integer-exact throughout; ppm
    * numerators are 10⁶·mass, so BIGINT holds to ~9×10¹² tokens per
    * source — past that, count mass in units of 2¹⁰ tokens first (the
    * sim_ivf_stats remedy; under pinned ANSI the overflow THROWS, it
    * cannot silently wrap). A sub-ppm source reports its boost against a
    * 1-ppm floor (GREATEST) rather than dividing by zero — the boost cap
    * is documented, the share columns stay exact. */
  val corpusMixtureTemperature = QuerySpec(
    "corpus_mixture_temperature",
    "temperature (alpha=0.5) mixture derivation: observed per-source token mass -> target ppm + boost",
    Some(s"""WITH d AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws FROM documents),
            |tm AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |    CAST(SUM(${TextFunctions.subwordTokenEstSql("ws")}) AS BIGINT) AS token_mass
            |  FROM d GROUP BY source),
            |wts AS MATERIALIZED (SELECT source, n_docs, token_mass,
            |    CAST(FLOOR(SQRT(token_mass)) AS BIGINT) AS weight FROM tm),
            |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS wsum,
            |    CAST(SUM(token_mass) AS BIGINT) AS msum FROM wts)
            |SELECT source, n_docs, token_mass, weight,
            |  (1000000 * weight) // tot.wsum AS share_ppm,
            |  (1000000 * token_mass) // tot.msum AS prop_ppm,
            |  (1000 * ((1000000 * weight) // tot.wsum))
            |    // GREATEST((1000000 * token_mass) // tot.msum, 1) AS boost_x1000
            |FROM wts CROSS JOIN tot ORDER BY source""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      val tm = Tables(s, dir, "documents")
        .select(col("source"),
          TextFunctions.subwordTokenEst(split(col("text"), " ")).as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("token_mass"))
      val wts = scope.track(tm.select(col("source"), col("n_docs"),
        col("token_mass"),
        floor(sqrt(col("token_mass"))).cast("long").as("weight")))
      val tot = wts.agg(sum("weight").as("wsum"), sum("token_mass").as("msum"))
      wts.crossJoin(Broadcasting.maybeBroadcast(tot))
        .select(col("source"), col("n_docs"), col("token_mass"), col("weight"),
          expr("(1000000 * weight) div wsum").as("share_ppm"),
          expr("(1000000 * token_mass) div msum").as("prop_ppm"),
          expr("(1000 * ((1000000 * weight) div wsum)) div " +
            "greatest((1000000 * token_mass) div msum, 1L)").as("boost_x1000"))
        .orderBy("source")
    })

  /** DEDUP-AWARE mixture derivation — the correction every real recipe
    * applies between [[corpusMixtureTemperature]] and training: raw
    * token mass DOUBLE-COUNTS duplicates, so a temperature mixture
    * derived pre-dedup systematically over-samples exactly the
    * duplicate-heavy (spammy) sources (`dedup_source_stats` shows where
    * that mass sits; FineWeb/C4-style recipes measure size AFTER dedup
    * for this reason). This entry derives the α=0.5 weights from
    * EFFECTIVE mass — tokens of canonical docs only, by the one shared
    * set-key law ([[DedupQueries.setKey]], min-doc_id canonical) — and
    * emits them beside the naive raw-mass derivation so the per-source
    * correction (`shift_x1000`) is a column: a source whose mass was
    * mostly duplicates visibly loses share.
    *
    * Scale shape: ONE corpus scan; the only corpus-sized shuffle keys on
    * the 16-byte binary digest (the canonical-flag window — the r12
    * shuffle-width law), then a map-side-combinable ≤|sources|-row
    * aggregation, a cached weight table, and a broadcast 1-row totals
    * join. Integer-exact: same floor-sqrt weighting and ppm/GREATEST
    * conventions as corpus_mixture_temperature. */
  val corpusMixtureDedupAware = QuerySpec(
    "corpus_mixture_dedup_aware",
    "dedup-aware temperature mixture: alpha=0.5 weights from canonical-doc token mass, shift vs naive shown",
    Some(s"""WITH d AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws,
            |    ${DedupQueries.setKeySql} AS set_key
            |  FROM documents),
            |c AS (SELECT doc_id, source, ws,
            |    doc_id = MIN(doc_id) OVER (PARTITION BY set_key) AS is_canonical FROM d),
            |tm AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |    CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
            |    CAST(SUM(${TextFunctions.subwordTokenEstSql("ws")}) AS BIGINT) AS raw_mass,
            |    CAST(SUM(CASE WHEN is_canonical THEN ${TextFunctions.subwordTokenEstSql("ws")} ELSE 0 END) AS BIGINT) AS eff_mass
            |  FROM c GROUP BY source),
            |wts AS MATERIALIZED (SELECT source, n_docs, n_canonical, raw_mass, eff_mass,
            |    CAST(FLOOR(SQRT(eff_mass)) AS BIGINT) AS eff_weight,
            |    CAST(FLOOR(SQRT(raw_mass)) AS BIGINT) AS raw_weight FROM tm),
            |tot AS (SELECT CAST(SUM(eff_weight) AS BIGINT) AS ewsum,
            |    CAST(SUM(raw_weight) AS BIGINT) AS rwsum FROM wts)
            |SELECT source, n_docs, n_canonical, raw_mass, eff_mass, eff_weight,
            |  (1000000 * eff_weight) // tot.ewsum AS share_ppm,
            |  (1000000 * raw_weight) // tot.rwsum AS naive_ppm,
            |  (1000 * ((1000000 * eff_weight) // tot.ewsum))
            |    // GREATEST((1000000 * raw_weight) // tot.rwsum, 1) AS shift_x1000
            |FROM wts CROSS JOIN tot ORDER BY source""".stripMargin),
    (s, dir, scope) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      // canonical flag over the 16-byte binary digest — the one shared
      // set-key law; the window is the only corpus-sized shuffle
      val w = Window.partitionBy("dg")
      val c = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.subwordTokenEst(
            graft.functions.TextFunctions.words(col("text"))).as("n_tok"),
          unhex(DedupQueries.setKey).as("dg"))
        .select(col("source"), col("n_tok"),
          (col("doc_id") === min(col("doc_id")).over(w)).as("is_canonical"))
      val tm = c.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canonical"),
        sum("n_tok").as("raw_mass"),
        sum(when(col("is_canonical"), col("n_tok")).otherwise(0L)).as("eff_mass"))
      val wts = scope.track(tm.select(col("source"), col("n_docs"),
        col("n_canonical"), col("raw_mass"), col("eff_mass"),
        floor(sqrt(col("eff_mass"))).cast("long").as("eff_weight"),
        floor(sqrt(col("raw_mass"))).cast("long").as("raw_weight")))
      val tot = wts.agg(sum("eff_weight").as("ewsum"), sum("raw_weight").as("rwsum"))
      wts.crossJoin(Broadcasting.maybeBroadcast(tot))
        .select(col("source"), col("n_docs"), col("n_canonical"),
          col("raw_mass"), col("eff_mass"), col("eff_weight"),
          expr("(1000000 * eff_weight) div ewsum").as("share_ppm"),
          expr("(1000000 * raw_weight) div rwsum").as("naive_ppm"),
          expr("(1000 * ((1000000 * eff_weight) div ewsum)) div " +
            "greatest((1000000 * raw_weight) div rwsum, 1L)").as("shift_x1000"))
        .orderBy("source")
    })

  val all: Seq[QuerySpec] = Seq(pipelineCorpus, pipelineCorpusPii,
    corpusClfScore, pipelineCorpusClf, pipelineCorpusBlocklist,
    corpusShards, corpusBudget, corpusMixture, corpusBudgetTokens,
    pipelinePretrain, corpusMixtureEpochs, pipelinePretrainEpochs,
    pipelinePack, pipelinePackOrdered, corpusMixtureCap, corpusCapTokens,
    corpusDiff, corpusDiffStored,
    corpusOrder, corpusOrderCurriculum, corpusSelectPerSource,
    corpusMixtureTemperature, corpusMixtureDedupAware)
}
