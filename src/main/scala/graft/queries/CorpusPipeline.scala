package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.functions.PortableHash.h48Sql

/** The end-to-end corpus-curation manifest — the query a training-data team
  * actually ships: every document classified as kept / low_quality /
  * duplicate / contaminated / benchmark, with a train/val/test split for the
  * keepers. One declarative plan composes the library's stages:
  *
  *   1. quality scoring ([[TextQueries.qualityScore]] — stopword ratio +
  *      length saturation, integer-exact),
  *   2. duplicate-cluster resolution (MinHash-LSH pairs →
  *      [[graft.operators.ConnectedComponents]] star contraction) keeping
  *      the best copy per cluster (n_chars, doc_id tie-break),
  *   3. benchmark-contamination screening ([[TextQueries.gram5]] overlap
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

  val pipelineCorpus = QuerySpec(
    "pipeline_corpus",
    "corpus curation manifest: quality + dedup-keep + contamination + split",
    Some(s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
            |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs
            |  UNION SELECT doc_a, doc_a FROM pairs
            |  UNION SELECT doc_b, doc_b FROM pairs),
            |reach(src, dst) AS (SELECT src, dst FROM e
            |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            |lab AS (SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS canonical_id
            |  FROM reach GROUP BY src),
            |qc AS (SELECT lab.doc_id, lab.canonical_id, d.n_chars
            |  FROM lab JOIN documents d ON d.doc_id = lab.doc_id),
            |keepx AS (SELECT doc_id, FIRST_VALUE(doc_id) OVER (PARTITION BY canonical_id
            |    ORDER BY n_chars DESC, doc_id) AS keep_id FROM qc),
            |dups AS (SELECT doc_id FROM keepx WHERE doc_id <> keep_id),
            |sc AS (SELECT doc_id, ${TextQueries.qualityScoreSql} AS score FROM t),
            |g AS (SELECT doc_id, ${TextQueries.gram5Sql} AS gl FROM t),
            |bg AS (SELECT DISTINCT UNNEST(gl) AS gram FROM g WHERE doc_id % 29 = 0),
            |ct AS (SELECT DISTINCT tr.doc_id
            |  FROM (SELECT doc_id, UNNEST(gl) AS gram FROM g WHERE doc_id % 29 <> 0) tr
            |  JOIN bg ON tr.gram = bg.gram),
            |st AS (SELECT sc.doc_id, sc.score,
            |    CASE WHEN sc.doc_id % 29 = 0 THEN 'benchmark'
            |      WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
            |      WHEN du.doc_id IS NOT NULL THEN 'duplicate'
            |      WHEN sc.score < 300 THEN 'low_quality'
            |      ELSE 'kept' END AS status,
            |    ${h48Sql("'s2:' || CAST(sc.doc_id AS VARCHAR)")} % 100 AS hs
            |  FROM sc LEFT JOIN ct ON ct.doc_id = sc.doc_id
            |  LEFT JOIN dups du ON du.doc_id = sc.doc_id)
            |SELECT doc_id, status, score AS score_x1000,
            |  CASE WHEN status = 'kept' THEN
            |    CASE WHEN hs < 80 THEN 'train' WHEN hs < 90 THEN 'val' ELSE 'test' END
            |  END AS split
            |FROM st ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      // ONE corpus scan: score + contamination grams derived in the same
      // fused projection, then persisted — every later branch reads this
      // compact table, never the raw parquet again
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("n_chars"),
          TextQueries.qualityScore(col("ws")).as("score_x1000"),
          TextQueries.gram5(col("ws")).as("gl"))
        .persist()
      val bench = base.filter(col("doc_id") % 29 === 0)
        .select(explode(col("gl")).as("gram")).distinct()
      val contam = base.filter(col("doc_id") % 29 =!= 0)
        .select(col("doc_id"), explode(col("gl")).as("gram"))
        .join(Broadcasting.maybeBroadcast(bench), "gram")
        .select("doc_id").distinct()
        .withColumn("is_contam", lit(true))
      val (labels, _) = graft.operators.ConnectedComponents.run(
        DedupQueries.minhashParts(s, dir)._2.select(col("doc_a"), col("doc_b")))
      val keepW = Window.partitionBy("canonical_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val dups = labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .join(base.select(col("doc_id"), col("n_chars")), "doc_id")
        .select(col("doc_id"), first(col("doc_id")).over(keepW).as("keep_id"))
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id")).withColumn("is_dup", lit(true))
      val hs = PortableHash.h48(concat(lit("s2:"), col("doc_id").cast("string"))) % 100
      base.select(col("doc_id"), col("score_x1000"))
        .join(contam, Seq("doc_id"), "left")
        .join(dups, Seq("doc_id"), "left")
        .withColumn("status",
          when(col("doc_id") % 29 === 0, "benchmark")
            .when(col("is_contam"), "contaminated")
            .when(col("is_dup"), "duplicate")
            .when(col("score_x1000") < 300, "low_quality")
            .otherwise("kept"))
        .select(col("doc_id"), col("status"), col("score_x1000"),
          when(col("status") === "kept",
            when(hs < 80, "train").when(hs < 90, "val").otherwise("test")).as("split"))
        .orderBy("doc_id")
    })

  val all: Seq[QuerySpec] = Seq(pipelineCorpus)
}
