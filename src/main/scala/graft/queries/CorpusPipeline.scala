package graft.queries

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
            |sc AS (SELECT doc_id, ${TextFunctions.qualityScoreSql} AS score FROM t),
            |g AS (SELECT doc_id, ${TextFunctions.gram5Sql} AS gl FROM t),
            |bg AS (SELECT DISTINCT UNNEST(gl) AS gram FROM g WHERE doc_id % 29 = 0),
            |ct AS (SELECT DISTINCT tr.doc_id
            |  FROM (SELECT doc_id, UNNEST(gl) AS gram FROM g WHERE doc_id % 29 <> 0) tr
            |  JOIN bg ON tr.gram = bg.gram),
            |st AS (SELECT sc.doc_id, sc.score,
            |    CASE WHEN sc.doc_id % 29 = 0 THEN 'benchmark'
            |      WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
            |      WHEN du.doc_id IS NOT NULL THEN 'duplicate'
            |      WHEN sc.score IS NULL OR sc.score < 300 THEN 'low_quality'
            |      ELSE 'kept' END AS status,
            |    ${h48Sql("'s2:' || CAST(sc.doc_id AS VARCHAR)")} % 100 AS hs
            |  FROM sc LEFT JOIN ct ON ct.doc_id = sc.doc_id
            |  LEFT JOIN dups du ON du.doc_id = sc.doc_id)
            |SELECT doc_id, status, score AS score_x1000,
            |  CASE WHEN status = 'kept' THEN
            |    CASE WHEN hs < 80 THEN 'train' WHEN hs < 90 THEN 'val' ELSE 'test' END
            |  END AS split
            |FROM st ORDER BY doc_id""".stripMargin),
    (s, dir) =>
      // the public operator (default Config matches this oracle literal-for-
      // literal: benchMod 29, floor 300, 80/10/10 on the s2 salt)
      graft.operators.CorpusCuration
        .manifest(Tables(s, dir, "documents"))
        .orderBy("doc_id"))

  val all: Seq[QuerySpec] = Seq(pipelineCorpus)
}
