package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Learned quality-classifier INFERENCE — the fastText-style linear scorer
  * every public curation recipe (CCNet, RefinedWeb, DCLM) gates on beside
  * the heuristic score: hashed n-gram features (word unigrams + bigrams,
  * fastText's `wordNgrams=2` configuration) looked up in a fixed weight
  * vector, the per-doc score their mean. Inference is EMBARRASSINGLY
  * PARALLEL — the model is a [[FtDim]]-entry literal broadcast into the
  * scan projection, so classifying 100 TB is one map-side pass with zero
  * shuffle, zero state, and the whole law inside whole-stage codegen
  * (transform/aggregate higher-order functions over a literal array; no
  * UDF).
  *
  * The "trained model" here is a DETERMINISTIC weight table — w[j] =
  * h48("ftw:" + j) % 2001, values 0..2000 — because this engine gates
  * arithmetic, not model quality: swapping in real fastText weights
  * changes only the literal, not one operator in the plan. Keeping weights
  * non-negative keeps every score non-negative, putting the integer
  * division where Spark's `div` and DuckDB's `//` (both truncating toward
  * zero) agree beyond any doubt — the q9_profit sign-convention lesson
  * applied at design time.
  *
  * Score law (all integer): `score_milli = (Σ_f w[h48("ftf:"+f) %
  * FtDim]) div max(n_features, 1)` — the mean feature weight. Weights
  * 0..2000 are already milli-units of a [0, 2] weight, so the mean needs
  * no rescaling; 1000 is the a-priori distribution mean, and
  * [[KeepThresholdMilli]] = 1000 splits the corpus near its median. The
  * DuckDB twin recomputes w[idx] INLINE from the same double-hash formula
  * rather than carrying a 4096-literal list — identical values by
  * construction ([[graft.functions.PortableHash]] is the cross-engine
  * contract).
  */
object QualityClassifier {

  /** Hashed feature buckets (fastText's `-bucket`, scaled to the corpus). */
  val FtDim = 4096

  /** Keep at or above the a-priori mean weight (1000 milli). */
  val KeepThresholdMilli = 1000L

  /** The model vector: w[j] = h48("ftw:j") % 2001 ∈ [0, 2000]. */
  lazy val weights: Array[Long] =
    (0 until FtDim).map(j => PortableHash.h48(s"ftw:$j") % 2001).toArray

  /** Feature list for a tokenized doc: 'u:'-prefixed unigrams plus
    * 'b:'-prefixed space-joined bigrams. */
  def features(ws: Column): Column = {
    val uni = transform(ws, t => concat(lit("u:"), t))
    val bi = when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat(lit("b:"), element_at(ws, i), lit(" "),
            element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(uni, bi)
  }

  private def featuresSql(ws: String): String =
    s"""LIST_CONCAT(LIST_TRANSFORM($ws, t -> 'u:' || t),
       |    CASE WHEN LEN($ws) >= 2 THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN($ws) - 1),
       |      i -> 'b:' || $ws[i] || ' ' || $ws[i + 1]) ELSE [] END)""".stripMargin

  /** Per-doc classifier score in milli-units (long, never null: an empty
    * or null token list scores 0). */
  def scoreMilli(ws: Column): Column = {
    val feats = features(ws)
    val w = typedlit(weights)
    val contribs = transform(feats, f =>
      element_at(w,
        (PortableHash.h48(concat(lit("ftf:"), f)) % FtDim).cast("int") + 1))
    val s = coalesce(aggregate(contribs, lit(0L), (a, x) => a + x), lit(0L))
    call_function("div", s, greatest(size(feats), lit(1)).cast("long"))
  }

  /** Feature count (long; 0 for an empty doc — `size` of the concat). */
  def nFeats(ws: Column): Column =
    greatest(size(features(ws)), lit(0)).cast("long")

  /** The full inference projection over a `(doc_id, text)` relation — ONE
    * definition of the output law shared by the batch entry
    * (`corpus_clf_score`) and its streaming twin (`stream_clf`), the
    * chunkProjection discipline: a stateless per-row projection, so it is
    * legal under append-mode streaming unchanged and the twin is
    * batch-equivalent by construction. Output unordered (callers add
    * their own orderBy / sink). */
  def scoreProjection(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("ws"))
      .select(col("doc_id"),
        nFeats(col("ws")).as("n_feats"),
        scoreMilli(col("ws")).cast("long").as("clf_milli"),
        graft.functions.TextFunctions.qualityScore(col("ws")).as("heuristic_x1000"))
      // derived from the computed column, not a second scoreMilli(ws) —
      // the keep flag must not depend on subexpression elimination to
      // avoid paying the feature-hash pipeline twice
      .withColumn("clf_keep", col("clf_milli") >= KeepThresholdMilli)

  /** DuckDB twins of [[scoreMilli]]/[[nFeats]], split so `feats` is built
    * ONCE via [[featsSql]] and the consuming columns derive over it — the
    * only SQL shape offered: an all-in-one form would inline the
    * unigram+bigram construction per consumer (numerator + GREATEST
    * denominator), bloating every generated oracle. The weight lookup is
    * the inline double-hash (bucket then weight), equal by construction
    * to the Scala-precomputed literal. */
  def featsSql(ws: String): String = featuresSql(ws)

  def scoreMilliOverFeatsSql(feats: String): String = {
    val bucket = s"CAST(${PortableHash.h48Sql("'ftf:' || f")} % $FtDim AS VARCHAR)"
    val wOf = s"${PortableHash.h48Sql(s"'ftw:' || $bucket")} % 2001"
    s"""COALESCE(LIST_SUM(LIST_TRANSFORM($feats, f -> $wOf)), 0)
       |    // GREATEST(LEN($feats), 1)""".stripMargin
  }

  def nFeatsOverFeatsSql(feats: String): String =
    s"GREATEST(COALESCE(LEN($feats), 0), 0)"
}
