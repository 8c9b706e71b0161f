package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, TextFunctions}
import graft.queries.Broadcasting

/** End-to-end corpus curation as a PUBLIC composable operator — the library
  * surface a training-data team points at THEIR document table: every row is
  * classified kept / low_quality / duplicate / contaminated / benchmark
  * (prioritized in that reverse order, so the manifest partitions the
  * corpus), and kept docs get a deterministic train/val/test split.
  *
  * Stages composed (each also available separately):
  *   1. quality scoring — [[graft.functions.TextFunctions.qualityScore]];
  *   2. duplicate resolution — [[MinHashLSH.signaturesAndPairs]] →
  *      [[ConnectedComponents]] star contraction, keeping the best copy per
  *      cluster (`n_chars` desc, `doc_id` tie-break);
  *   3. contamination screening — [[graft.functions.TextFunctions.gram5]]
  *      overlap against the `doc_id % benchMod == 0` slice (stand-in for a
  *      fixed eval suite), broadcast-probed;
  *   4. split assignment — [[PortableHash]] threshold on `salt:doc_id`, so
  *      a doc's split never changes as the corpus around it grows.
  *
  * Scale shape: ONE corpus scan derives (score, grams) in a fused projection
  * and persists; the only corpus-sized shuffles are the LSH band join and
  * the contamination distinct. The `pipeline_corpus` catalog entry runs
  * exactly this operator under the DuckDB oracle (config defaults are
  * literal-for-literal what that oracle recomputes).
  *
  * Input columns: `doc_id` (integral), `text` (string), `n_chars`
  * (integral). A null `text` yields a null score; such docs are classified
  * `low_quality` (never silently kept or split-assigned).
  *
  * Cache lifetime: the operator persists the scored corpus scan and (inside
  * [[MinHashLSH]]) the signature table; pass a [[CacheScope]] and release()
  * it once the manifest is materialized — the default Unmanaged scope is
  * only for harnesses that clear the session cache themselves.
  */
object CorpusCuration {

  final case class Config(
      benchMod: Long = 29,        // benchmark slice: doc_id % benchMod == 0
      minScoreX1000: Long = 300,  // quality floor (txt_quality's 'mid' band)
      // defaults pinned to the shared split-assignment law, so the manifest
      // and txt_sample_split can never drift
      trainPct: Int = TextFunctions.DefaultTrainPct,
      valPct: Int = TextFunctions.DefaultValPct,
      splitSalt: String = TextFunctions.DefaultSplitSalt,
      // PII screening stage (C4/RefinedWeb/Dolma-class): when set, docs
      // whose total regex PII hit count (emails + phones + IPs,
      // TextFunctions.piiCounts) EXCEEDS the threshold are classified
      // 'pii' — priority between 'contaminated' and 'duplicate'. None
      // (default) skips the stage entirely: no regex work in the scan, no
      // schema or status change for existing callers. A production recipe
      // REDACTS low-count docs (TextFunctions.piiRedact) and drops only
      // PII-dense ones (likely data dumps / scraped directories), which is
      // why the knob is a threshold, not a boolean.
      piiDropAbove: Option[Long] = None,
      // Learned-classifier gate (CCNet/RefinedWeb/DCLM-class): when set,
      // docs scoring BELOW the threshold on the fastText-style linear
      // scorer ([[QualityClassifier.scoreMilli]]) classify 'clf_reject' —
      // priority after 'low_quality' (the heuristic floor names the death
      // first; the classifier refines among heuristic survivors, which is
      // how production recipes stack the two). None (default) skips the
      // stage: no feature hashing in the scan, no status change for
      // existing callers.
      clfDropBelow: Option[Long] = None,
      // Domain-blocklist / opt-out screening (the C4 badwords-domain /
      // RefinedWeb URL-blocklist / robots-opt-out stage every public
      // curation recipe runs): docs whose `source` appears in the list
      // classify 'blocked' — priority between 'duplicate' and
      // 'low_quality' (the drop is compliance-driven, so it names the
      // death before the quality floor does, but a duplicate of a
      // non-blocked canonical still counts as what it is). The list rides
      // a BROADCAST join keyed on `source` (not an isin literal), so a
      // production blocklist of 10^5+ domains ships once per executor and
      // the screen stays map-side. Nil (default) skips the stage: no
      // source column required, no status change for existing callers.
      blockSources: Seq[String] = Nil)

  /** The blocklist as a broadcast `(source, is_blocked)` relation — ONE
    * definition shared by the manifest's blocked stage and the streaming
    * admission screen, so the column name, flag convention, and validity
    * checks can never fork between the two. Duplicate entries are
    * rejected up front: each duplicate row would multiply every document
    * of that source through the left join (the SQL twin's IN-list would
    * not), a silent engine/oracle row-count fork. */
  /** The validity law shared by BOTH sides of the one blocklist
    * definition — non-null entries (a null never matches the broadcast
    * join, and the SQL IN-list cannot express it) and no duplicates (each
    * duplicate row would multiply every doc of that source through the
    * left join where the IN-list would not — a silent engine/oracle
    * row-count fork). Routing blocklistDf AND blocklistInSql through this
    * one helper keeps the "one definition" contract from forking: a list
    * the engine accepts, the oracle generator accepts, and vice versa. */
  private def validatedBlocklist(srcs: Seq[String]): Seq[String] = {
    require(srcs.forall(_ != null), "blockSources entries must be non-null " +
      "(a null source never matches the join; list it explicitly if unattributed docs must block)")
    require(!srcs.contains(""), "blockSources must not contain the empty string — " +
      "'' is the orphan-vector sentinel in the staged postings artifact " +
      "(attachSourceAttr), and a '' blocklist entry would silently exclude " +
      "every unattributed vector from search instead of blocking a real source")
    require(srcs.distinct.size == srcs.size,
      "duplicate blockSources entries — each duplicate row would emit " +
        "every doc of that source multiple times through the broadcast join")
    srcs
  }

  def blocklistDf(spark: org.apache.spark.sql.SparkSession,
      srcs: Seq[String]): DataFrame = {
    import spark.implicits._
    broadcast(validatedBlocklist(srcs).toDF("source")
      .withColumn("is_blocked", lit(true)))
  }

  /** DuckDB twin of [[blocklistDf]]'s membership test: the quoted IN-list
    * literal (the oracle side of the same one definition) — same
    * validation, quoting via the shared [[graft.functions.SqlText.lit]]
    * law so an apostrophe-bearing source name quotes correctly instead of
    * silently corrupting the generated oracle while the Spark side keeps
    * working. */
  def blocklistInSql(srcs: Seq[String]): String =
    validatedBlocklist(srcs).map(graft.functions.SqlText.lit).mkString(", ")

  def manifest(docs: DataFrame, cfg: Config = Config(),
      scope: CacheScope = CacheScope.Unmanaged): DataFrame = {
    // the PII counts ride the SAME fused scan projection as score + grams
    // (one corpus scan, one persisted derived table) — only when the stage
    // is on
    val blockOn = cfg.blockSources.nonEmpty
    // the source column rides the scan/derived/output selects only when
    // the blocklist stage is on — one definition of that conditional
    val srcCol = if (blockOn) Seq(col("source")) else Nil
    val derivedCols = Seq(col("doc_id"), col("n_chars"),
      TextFunctions.qualityScore(col("ws")).as("score_x1000"),
      TextFunctions.gram5(col("ws")).as("gl")) ++
      srcCol ++
      cfg.piiDropAbove.map { _ =>
        val (em, ph, ip) = TextFunctions.piiCounts(col("text"))
        (em + ph + ip).as("n_pii")
      } ++
      cfg.clfDropBelow.map(_ =>
        QualityClassifier.scoreMilli(col("ws")).as("clf_milli"))
    val base = scope.track(docs
      .select(Seq(col("doc_id"), col("n_chars"), col("text"),
        split(col("text"), " ").as("ws")) ++ srcCol: _*)
      .select(derivedCols: _*))
    val bench = base.filter(col("doc_id") % cfg.benchMod === 0)
      .select(explode(col("gl")).as("gram")).distinct()
    val contam = base.filter(col("doc_id") % cfg.benchMod =!= 0)
      .select(col("doc_id"), explode(col("gl")).as("gram"))
      .join(Broadcasting.maybeBroadcast(bench), "gram")
      .select("doc_id").distinct()
      .withColumn("is_contam", lit(true))
    val (labels, _) = ConnectedComponents.run(
      MinHashLSH.signaturesAndPairs(docs, scope = scope)._2
        .select(col("doc_a"), col("doc_b")), scope = scope)
    val keepW = Window.partitionBy("canonical_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dups = labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
      .join(base.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id"), first(col("doc_id")).over(keepW).as("keep_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id")).withColumn("is_dup", lit(true))
    val hs = TextFunctions.splitHash(col("doc_id"), cfg.splitSalt)
    val statusCol = {
      val head = when(col("doc_id") % cfg.benchMod === 0, "benchmark")
        .when(col("is_contam"), "contaminated")
      // pii sits between contaminated and duplicate: a cluster whose
      // canonical copy is PII-dense drops for THAT reason, identically for
      // its duplicates (same text, same counts) — deterministic either way,
      // but the reason a doc died should name the worst offense first
      val withPii = cfg.piiDropAbove.fold(head)(t =>
        head.when(col("n_pii") > t, "pii"))
      val withDup = withPii.when(col("is_dup"), "duplicate")
      // blocked sits between duplicate and the quality floor: compliance
      // names the death before quality does (is_blocked is null for
      // unlisted sources — a null when-condition skips the arm, the
      // is_contam/is_dup convention)
      val withBlock = if (blockOn) withDup.when(col("is_blocked"), "blocked")
        else withDup
      val withHeur = withBlock
        // null-safe: a null text scores null, and `null < x` is null, so
        // without the isNull arm a null-text doc would fall through to
        // 'kept' with a null score and a split assigned
        .when(col("score_x1000").isNull ||
          col("score_x1000") < cfg.minScoreX1000, "low_quality")
      // the classifier refines among heuristic survivors (clf_milli is
      // never null — QualityClassifier.scoreMilli coalesces to 0)
      cfg.clfDropBelow.fold(withHeur)(t =>
        withHeur.when(col("clf_milli") < t, "clf_reject"))
        .otherwise("kept")
    }
    val labeled = base.select(Seq(col("doc_id"), col("score_x1000")) ++
        srcCol ++
        cfg.piiDropAbove.map(_ => col("n_pii")) ++
        cfg.clfDropBelow.map(_ => col("clf_milli")): _*)
      .join(contam, Seq("doc_id"), "left")
      .join(dups, Seq("doc_id"), "left")
    // broadcast table join, not an isin literal: a production blocklist
    // is 10^5+ domains — as a literal IN it bloats the plan and skips
    // codegen; as a broadcast hash relation it ships once per executor
    val withBlocklist = if (!blockOn) labeled
      else labeled.join(blocklistDf(docs.sparkSession, cfg.blockSources),
        Seq("source"), "left")
    withBlocklist
      .withColumn("status", statusCol)
      .select(col("doc_id"), col("status"), col("score_x1000"),
        when(col("status") === "kept",
          TextFunctions.splitAssign(hs, cfg.trainPct, cfg.valPct)).as("split"))
  }

  /** The mixture DECISION alone — the input columns PASSED THROUGH plus
    * `target_ppm` and `is_kept`, computed map-side from a broadcast config
    * join + the hash-threshold law, with no persist and no accounting.
    * This is the unit [[mixtureSample]] builds on; use it directly when
    * composing (e.g. the `pipeline_pretrain` build, where the
    * achieved-count columns would be discarded but their aggregation +
    * join could not be pruned by Catalyst) — and it is streaming-safe: a
    * stateless stream-static broadcast join, so `stream_corpus_ingest`
    * runs the identical law incrementally. Requires `doc_id` and `source`
    * columns; `target_ppm`/`is_kept` must not already exist. */
  def mixtureDecisions(docs: DataFrame, weightsPpm: Seq[(String, Long)],
      defaultPpm: Long, salt: String = "mx"): DataFrame = {
    require(defaultPpm >= 0 && defaultPpm <= 1000000, s"defaultPpm=$defaultPpm not in [0, 1e6]")
    require(weightsPpm.forall { case (_, p) => p >= 0 && p <= 1000000 },
      "every target_ppm must be in [0, 1e6]")
    require(weightsPpm.forall(_._1 != null), "weightsPpm keys must be non-null " +
      "(unattributed docs sample at defaultPpm; a null key could never match the join)")
    require(weightsPpm.map(_._1).distinct.size == weightsPpm.size,
      "duplicate source keys in weightsPpm — each would match every doc of " +
      "that source, emitting contradictory manifest rows")
    require(Seq("target_ppm", "is_kept", "mx_cfg_ppm")
        .forall(c => !docs.columns.contains(c)),
      "docs already has a target_ppm/is_kept/mx_cfg_ppm column — rename it before deciding")
    val spark = docs.sparkSession
    import spark.implicits._
    // config column named to dodge collisions with caller pass-through cols
    val w = broadcast(weightsPpm.toDF("source", "mx_cfg_ppm"))
    val keepHash = PortableHash.h48(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 1000000L
    docs.join(w, Seq("source"), "left")
      .withColumn("target_ppm", coalesce(col("mx_cfg_ppm"), lit(defaultPpm)))
      .withColumn("is_kept", keepHash < col("target_ppm"))
      .drop("mx_cfg_ppm")
  }

  /** Domain-mixture sampling — the reweighting stage every production corpus
    * build runs after curation (the Pile / DoReMi-style mixture step): given
    * per-SOURCE target keep rates, emit a deterministic doc-level sampled
    * manifest. Each doc keeps iff `h48(salt:doc_id) % 1e6 < target_ppm`, so
    * membership is reproducible on any cluster, any partitioning, any
    * engine, and a source's sample only GROWS as the corpus grows (the
    * hash-threshold property — no reshuffling of past decisions). Sources
    * absent from `weightsPpm` fall back to `defaultPpm`.
    *
    * Output: one row per input doc — (doc_id, source, target_ppm, is_kept,
    * src_kept, src_total), where src_kept/src_total are the source's
    * ACHIEVED counts, attached so a manifest consumer can audit realized vs
    * target mixture without a second pass.
    *
    * Scale shape: the weights config is a broadcast literal table (one
    * row per source); the per-source accounting is a partial-aggregated
    * groupBy bounded by the source enum, broadcast-joined back — NOT a
    * per-source window, which would co-locate every doc of a source on one
    * partition and die on the first skewed source at 100 TB. The manifest
    * scan feeds both the accounting and the output join, so it persists
    * under the caller's [[CacheScope]]. A NULL source is a real group (it
    * samples at `defaultPpm` and gets its own accounting row), so the
    * accounting join is null-safe — an equi-join would silently drop every
    * unattributed doc from the manifest. */
  def mixtureSample(docs: DataFrame, weightsPpm: Seq[(String, Long)],
      defaultPpm: Long, salt: String = "mx",
      scope: CacheScope = CacheScope.Unmanaged): DataFrame = {
    // prune to the law's inputs BEFORE persisting: a wide caller frame must
    // not inflate the scope-owned decision table
    val m = scope.track(
      mixtureDecisions(docs.select(col("doc_id"), col("source")),
        weightsPpm, defaultPpm, salt)
      .select(col("doc_id"), col("source"), col("target_ppm"), col("is_kept")))
    // bounded by the source enum after partial aggregation; broadcast back
    // (size-guarded: "sources" is usually an enum but nothing enforces it —
    // a million-source corpus degrades to a shuffle join, not a driver OOM)
    val perSrc = m.groupBy("source").agg(
      sum(when(col("is_kept"), 1L).otherwise(0L)).as("src_kept"),
      count(lit(1)).as("src_total"))
      .withColumnRenamed("source", "acct_source")
    m.join(Broadcasting.maybeBroadcast(perSrc),
        col("source") <=> col("acct_source"))
      .select(col("doc_id"), col("source"), col("target_ppm"),
        col("is_kept"), col("src_kept"), col("src_total"))
  }

  /** [[mixtureEpochs]] weight ceiling: 64 epochs in ppm of one pass. */
  val MaxEpochsPpm: Long = 64000000L

  /** Mixture with UPSAMPLING — the half of domain reweighting
    * [[mixtureSample]] can't express: production mixtures routinely weight
    * a small high-quality source ABOVE 1× (the "N epochs of Wikipedia"
    * pattern), so `epochsPpm` is epochs in parts-per-million of one pass —
    * 2_500_000 = 2.5 epochs. Every doc of that source is emitted
    * ⌊ppm/1e6⌋ times unconditionally, plus one more iff
    * `h48(salt:doc_id) % 1e6 < ppm % 1e6` — the SAME hash-threshold law as
    * mixtureSample (to which this degenerates exactly when all ppm ≤ 1e6),
    * so membership of the fractional copy is deterministic, engine-portable,
    * and grows monotonically with the corpus. Copies carry `copy`
    * 0..n_copies-1 so a downstream shuffle-shard step can spread a doc's
    * epochs across shards (same-shard epochs would co-locate duplicate
    * text in one training shard).
    *
    * Output: one row per EMITTED COPY — (doc_id, source, target_ppm, copy,
    * src_emitted, src_total); a doc whose source drops entirely (ppm < 1e6
    * and the hash loses) emits no rows. src_emitted counts emitted copies,
    * src_total input docs, per source — the realized-epoch audit.
    *
    * Scale shape: one pruned scan, the broadcast config join, then a
    * map-side `explode(sequence(...))` whose fan-out is bounded by
    * ⌈max ppm / 1e6⌉ (capped at [[MaxEpochsPpm]] = 64 epochs — a fat-finger
    * weight of 1e9 would otherwise 1000× the corpus); accounting is the
    * same bounded partial-aggregated groupBy broadcast back null-safely. */
  /** The epoch COPY-COUNT decision alone — the input columns PASSED
    * THROUGH plus `target_ppm` and `n_copies`, computed map-side from the
    * broadcast config join + the hash-threshold law, with no persist, no
    * explode, and no accounting. The epochs twin of [[mixtureDecisions]]:
    * use it when composing (the `pipeline_pretrain_epochs` build explodes
    * the copies itself so score/n_chars ride through without a re-join,
    * and the accounting machinery would not be Catalyst-prunable).
    * Requires `doc_id` and `source`; `target_ppm`/`n_copies` must not
    * already exist. */
  def epochCopies(docs: DataFrame, epochsPpm: Seq[(String, Long)],
      defaultPpm: Long, salt: String = "mx"): DataFrame = {
    require(defaultPpm >= 0 && defaultPpm <= MaxEpochsPpm,
      s"defaultPpm=$defaultPpm not in [0, $MaxEpochsPpm]")
    require(epochsPpm.forall { case (_, p) => p >= 0 && p <= MaxEpochsPpm },
      s"every epochs_ppm must be in [0, $MaxEpochsPpm] (64 epochs)")
    require(epochsPpm.forall(_._1 != null), "epochsPpm keys must be non-null " +
      "(unattributed docs sample at defaultPpm; a null key could never match the join)")
    require(epochsPpm.map(_._1).distinct.size == epochsPpm.size,
      "duplicate source keys in epochsPpm — each would match every doc of " +
      "that source, emitting contradictory copy sets")
    require(Seq("target_ppm", "n_copies", "mx_cfg_ppm")
        .forall(c => !docs.columns.contains(c)),
      "docs already has a target_ppm/n_copies/mx_cfg_ppm column — rename it first")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(epochsPpm.toDF("source", "mx_cfg_ppm"))
    val keepHash = PortableHash.h48(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 1000000L
    val ppm = coalesce(col("mx_cfg_ppm"), lit(defaultPpm))
    docs.join(w, Seq("source"), "left")
      .withColumn("target_ppm", ppm)
      // exact integral epochs: (ppm - ppm%1e6)/1e6 divides a precise
      // multiple, so the double division cannot round (Column./ is
      // double; a bare ppm/1e6 could not express `div` exactly)
      .withColumn("n_copies",
        ((ppm - ppm % 1000000L) / 1000000L).cast("long") +
          when(keepHash < ppm % 1000000L, 1L).otherwise(0L))
      .drop("mx_cfg_ppm")
  }

  /** [[quotaCap]] hash-bucket count: thresholds are decided at bucket
    * granularity, so a source's realized take is exact up to one bucket's
    * docs (~1/1000 of the source under uniform hashing). */
  val QuotaBuckets: Long = 1000L

  /** Per-source QUOTA CAP — the third standard mixture form next to rate
    * ([[mixtureSample]]) and epochs ([[mixtureEpochs]]): a hard maximum
    * document count per source ("take at most N from the crawl dump"),
    * decided deterministically so the same docs survive on any cluster,
    * any partitioning, any engine.
    *
    * The naive form (rank docs per source, keep rank ≤ cap) is a
    * per-source global sort — every doc of a source through ONE reducer,
    * dead on the first skewed source at 100 TB. Here the cap becomes a
    * HASH-BUCKET threshold instead (the `corpus_budget_select` histogram
    * pattern applied per source): each doc lands in bucket
    * `h48(salt:doc_id) % QuotaBuckets`, per-(source, bucket) counts
    * partial-aggregate (≤ sources × 1000 rows cross the shuffle), the
    * cumulative sum runs per source over that BOUNDED table, and the
    * kept set is `bucket ≤ t_src` where t_src is the largest bucket whose
    * INCLUSIVE prefix count fits the cap — so the realized take NEVER
    * exceeds the cap (a hard quota undershoots at bucket granularity; it
    * must not overshoot), a source at-or-under its cap keeps everything,
    * and cap 0 keeps nothing (no bucket qualifies → null threshold →
    * is_kept false, never null). Hash-threshold membership is monotone:
    * as a source grows, its threshold only tightens — docs already
    * dropped never come back, matching the rate law's stability story.
    *
    * Output: one row per input doc — (doc_id, source, cap_docs, is_kept,
    * src_kept, src_total) with the same null-safe per-source achieved
    * accounting as [[mixtureSample]]. Sources absent from `capsDocs` fall
    * back to `defaultCap`; a NULL source is a real group with its own cap
    * and accounting row. */
  def quotaCap(docs: DataFrame, capsDocs: Seq[(String, Long)],
      defaultCap: Long, salt: String = "qc",
      scope: CacheScope = CacheScope.Unmanaged): DataFrame =
    quotaCapOn(docs, lit(1L), "cap_docs", capsDocs, defaultCap, salt, scope)

  /** MASS-denominated [[quotaCap]] — the cap is a budget of `mass` units
    * (tokens, chars, bytes) per source instead of a document count, the
    * same chars→tokens generalization `corpus_budget_tokens` applies to
    * `corpus_budget_select`: the bucket histogram sums `mass` rather than
    * counting rows, and the inclusive-prefix threshold guarantees each
    * source's realized TAKE MASS never exceeds its cap (undershoot is
    * bounded by one bucket's mass). `mass` is any integral expression over
    * the input row (e.g. the subword token estimate) — a fractional type
    * is rejected at plan time (silent truncation would fork the
    * accounting from the caller's own sum) and a negative value raises in
    * the scan (it would void the prefix bound); src_kept/src_total
    * account in the same unit. Output column `cap_mass` replaces
    * `cap_docs`. */
  def quotaCapMass(docs: DataFrame, mass: org.apache.spark.sql.Column,
      capsMass: Seq[(String, Long)], defaultCap: Long, salt: String = "qc",
      scope: CacheScope = CacheScope.Unmanaged): DataFrame =
    quotaCapOn(docs, mass, "cap_mass", capsMass, defaultCap, salt, scope)

  private def quotaCapOn(docs: DataFrame, mass: org.apache.spark.sql.Column,
      capCol: String, caps: Seq[(String, Long)], defaultCap: Long,
      salt: String, scope: CacheScope): DataFrame = {
    require(defaultCap >= 0, s"defaultCap=$defaultCap must be >= 0")
    require(caps.forall(_._2 >= 0), "every cap must be >= 0")
    require(caps.forall(_._1 != null), "cap keys must be non-null " +
      "(unattributed docs cap at defaultCap; a null key could never match the join)")
    require(caps.map(_._1).distinct.size == caps.size,
      "duplicate source keys in the cap config — each would match every " +
      "doc of that source, emitting contradictory thresholds")
    require(Seq(capCol, "is_kept", "qc_cfg_cap", "qc_bkt", "qc_mass")
        .forall(c => !docs.columns.contains(c)),
      s"docs already has a $capCol/is_kept/qc_cfg_cap/qc_bkt/qc_mass column — rename it first")
    // fail fast at the boundary, mirroring the cap requires above: a
    // fractional mass would silently truncate toward zero (the caller's
    // own sum of the expression would then disagree with src_kept), and a
    // negative mass voids the inclusive-prefix undershoot bound — the
    // type is checkable at plan time, the sign per row in the scan
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val massType = docs.select(mass.as("m")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(massType),
      s"mass must be an integral expression (got $massType) — truncating " +
        "a fractional mass would make the accounting disagree with the caller's own sum")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(caps.toDF("source", "qc_cfg_cap"))
    val bkt = PortableHash.h48(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % QuotaBuckets
    val checkedMass = {
      val m = mass.cast("long")
      when(m < 0, raise_error(concat(
        lit("quotaCap mass must be non-negative, got "), m.cast("string"))))
        .otherwise(m)
    }
    // pruned + persisted: feeds the bucket histogram AND the output join
    val d = scope.track(docs
      .select(col("doc_id"), col("source"), checkedMass.as("qc_mass"))
      .join(w, Seq("source"), "left")
      .withColumn(capCol, coalesce(col("qc_cfg_cap"), lit(defaultCap)))
      .drop("qc_cfg_cap")
      .withColumn("qc_bkt", bkt))
    // ≤ sources × QuotaBuckets rows after partial aggregation; the window
    // runs over that bounded table, never the corpus (the cap is
    // functionally determined by source — carrying it through the groupBy
    // avoids a re-join for the threshold comparison)
    val cum = d.groupBy("source", capCol, "qc_bkt")
      .agg(sum("qc_mass").as("n"))
      .withColumn("cum", sum("n").over(
        Window.partitionBy("source").orderBy("qc_bkt")))
    val thresholds = cum.groupBy("source")
      .agg(max(when(col("cum") <= col(capCol), col("qc_bkt"))).as("qc_t"))
      .withColumnRenamed("source", "t_source")
    val decided = d
      .join(Broadcasting.maybeBroadcast(thresholds),
        col("source") <=> col("t_source"))
      .withColumn("is_kept", coalesce(col("qc_bkt") <= col("qc_t"), lit(false)))
    val perSrc = decided.groupBy("source").agg(
      sum(when(col("is_kept"), col("qc_mass")).otherwise(0L)).as("src_kept"),
      sum(col("qc_mass")).as("src_total"))
      .withColumnRenamed("source", "acct_source")
    decided.join(Broadcasting.maybeBroadcast(perSrc),
        col("source") <=> col("acct_source"))
      .select(col("doc_id"), col("source"), col(capCol),
        col("is_kept"), col("src_kept"), col("src_total"))
  }

  def mixtureEpochs(docs: DataFrame, epochsPpm: Seq[(String, Long)],
      defaultPpm: Long, salt: String = "mx",
      scope: CacheScope = CacheScope.Unmanaged): DataFrame = {
    // decide via the shared law, prune to its columns, persist for the
    // accounting + explode branches
    val copies = scope.track(
      epochCopies(docs.select(col("doc_id"), col("source")), epochsPpm,
        defaultPpm, salt)
      .select(col("doc_id"), col("source"), col("target_ppm"),
        col("n_copies")))
    val perSrc = copies.groupBy("source").agg(
      sum("n_copies").as("src_emitted"), count(lit(1)).as("src_total"))
      .withColumnRenamed("source", "acct_source")
    copies.filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("target_ppm"),
        explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy"))
      .join(Broadcasting.maybeBroadcast(perSrc),
        col("source") <=> col("acct_source"))
      .select(col("doc_id"), col("source"), col("target_ppm"), col("copy"),
        col("src_emitted"), col("src_total"))
  }
}
