package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured comparison of the two MinHash signature shapes (SURVEY §7.3
  * names MinHash as the one genuine custom-aggregator candidate; VERDICT r4
  * asked for the typed-Aggregator alternative to be built and BENCHED, not
  * argued):
  *
  *   - explode + K plain min() aggregates (production shape: whole-stage
  *     codegen, map-side partial aggregation);
  *   - `MinHashLSH.SigAggregator`, a typed Aggregator updating all K mins in
  *     one mutable long-array buffer per row.
  *
  * The corpus is replicated 20× (100k docs, ~30MB text) so the signal beats
  * scheduler noise. Both shapes are equality-checked row-for-row before
  * timing; results go to CHANGES.md and the loser's Scaladoc. Run:
  *   sbt "runMain graft.MinHashBench"
  */
object MinHashBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // ansi pinned as in Verify/Bench: one documented overflow semantics
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 20
    val work = graft.TempDirs.create("graft-stream-mhbench")
    val base = graft.queries.Tables(spark, sfDir, "documents").select("doc_id", "text")
    (0 until reps).map(r => base.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/docs.parquet")
    val docs = spark.read.parquet(s"$work/docs.parquet")
    val nDocs = docs.count()
    println(s"[minhashbench] corpus: $nDocs docs (${reps}x sf replica)")

    // row-for-row equality first — a fast wrong shape is worthless
    val a = graft.operators.MinHashLSH.signatures(docs).select("doc_id", "sig")
    val b = graft.operators.MinHashLSH.signaturesViaAggregator(docs).select("doc_id", "sig")
    val mismatches = a.join(b.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(not(col("sig") === col("sig2"))).count()
    require(mismatches == 0, s"$mismatches signature mismatches between shapes")
    require(a.count() == b.count(), "row-count mismatch between shapes")
    println(s"[minhashbench] equality: OK (0 mismatches over $nDocs docs)")

    def timed(label: String)(body: => Long): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        require(n == nDocs, s"$label produced $n of $nDocs signatures")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(s"[minhashbench] $label: ${fmt(times(1))}s (runs: ${times.map(fmt).mkString(", ")})")
      times(1)
    }
    // interleaved so host drift hits both equally
    val warm1 = timed("explode+min (warmup)") {
      graft.operators.MinHashLSH.signatures(docs).count()
    }
    val tAgg = timed("typed SigAggregator udaf") {
      graft.operators.MinHashLSH.signaturesViaAggregator(docs).count()
    }
    val tMin = timed("explode+min (production)") {
      graft.operators.MinHashLSH.signatures(docs).count()
    }
    println(s"[minhashbench] ratio aggregator/production = ${fmt(tAgg / tMin)} (warmup ${fmt(warm1)}s)")

    graft.TempDirs.delete(work) // prompt cleanup; shutdown hook is the backstop
    spark.stop()
  }
}
