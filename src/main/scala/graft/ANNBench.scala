package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured recall/throughput trade-off of the catalog's ANN families —
  * the number an ANN user asks FIRST and the one a correctness gate cannot
  * carry: `sim_ann_bucket_topk` / `sim_ann_multiprobe` / `sim_ivf_topk` are
  * hash-gated against their own definitions (the bucketing law is exact),
  * but how much of the TRUE top-k the bucket restriction keeps, and what
  * that recall costs, was argued from the LSH collision model, never
  * measured (the round-5/6 lesson: pinned-but-unmeasured is where a claim
  * hides its failure). This harness measures, at bench scale:
  *
  *   - recall@10 against the exact brute-force ground truth, per method;
  *   - wall time, split into index build (amortized once at 100 TB) and
  *     query phase (paid per batch);
  *   - candidates scored per query — THE scale metric: at 100 TB the
  *     methods differ exactly in how many of the N vectors survive the
  *     bucket equi-join into the exact-scoring stage.
  *
  * Methods share one deterministic tie-break (cos DESC, vec_id ASC) and one
  * codegen'd scorer (`vec_dot`), so the deltas isolate the candidate
  * restriction. Because every method ranks its candidates by EXACT cosine,
  * recall equals the fraction of true neighbors admitted by the candidate
  * set — monotone in the probe set, which the harness asserts (multi-probe
  * recall can never fall below single-probe; a violation means the probe
  * law is wrong, not the data).
  *
  * Two regimes, because ANN recall is DATA-DEPENDENT and the honest number
  * reports both:
  *   - `clustered`: planted centers with small noise — neighbors are
  *     same-cluster, the regime ANN indexes exist for;
  *   - `uniform`: no structure — neighbors are arbitrary, the known hard
  *     case for data-oblivious hyperplanes (the floor, not the pitch).
  *
  * Deterministic xxhash64 generation (engine-local bench, not oracle-gated;
  * the gated queries stay on the h48 portable law). Results recorded in
  * README / CHANGES.md. Run: sbt "runMain graft.ANNBench"
  */
object ANNBench {

  private val Dim = 64
  private val TopK = 10

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  /** Planted float vectors: component = center(id % c) + noise in the
    * clustered regime, pure noise in the uniform one. Components land in
    * [-1, 1]-ish float space like the corpus embeddings. */
  private def planted(spark: SparkSession, n: Long, c: Int,
      clustered: Boolean): DataFrame = {
    def h(salt: String, key: Column, j: Column) =
      xxhash64(concat_ws(":", lit(salt), key.cast("string"), j.cast("string")))
    val vec = transform(sequence(lit(0), lit(Dim - 1)), j => {
      val comp =
        if (clustered)
          (pmod(h("c", col("id") % c, j), lit(2001L)) - 1000L) / 1000.0 +
            (pmod(h("n", col("id"), j), lit(301L)) - 150L) / 1000.0
        else (pmod(h("u", col("id"), j), lit(2001L)) - 1000L) / 1000.0
      comp.cast("float")
    })
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  private def cosCol(a: Column, b: Column): Column =
    call_function("vec_dot", a, b) /
      (sqrt(call_function("vec_dot", a, a)) * sqrt(call_function("vec_dot", b, b)))

  /** Exact top-k by cosine over an already-restricted candidate set
    * (q_id, q_emb, vec_id, embedding). */
  private def topk(cands: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    cands
      .select(col("q_id"), col("vec_id"),
        cosCol(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select("q_id", "vec_id")
  }

  private final case class Run(label: String, indexSecs: Double,
      querySecs: Double, recall: Double, candsPerQuery: Long)

  /** Recall@k = |truth ∩ returned| / (Q·k); candidate count measured on the
    * same restricted frame the method scored. */
  private def measure(label: String, truth: DataFrame, nQueries: Int,
      indexSecs: Double, cands: DataFrame): Run = {
    // timed region = the top-k computation ONLY: got.count() materializes
    // the persisted result, so the recall join and candidate count below
    // read the cache and never re-run (or inflate) the measured query
    val t0 = System.nanoTime()
    val got = topk(cands).persist()
    got.count()
    val querySecs = (System.nanoTime() - t0) / 1e9
    val hit = got.join(truth, Seq("q_id", "vec_id")).count()
    got.unpersist(blocking = false)
    val nCands = cands.count() / math.max(1, nQueries)
    val recall = hit.toDouble / (nQueries.toLong * TopK)
    println(s"[annbench] $label: recall@$TopK=${fmt(recall)} " +
      s"index=${fmt(indexSecs)}s query=${fmt(querySecs)}s " +
      s"~$nCands candidates/query")
    Run(label, indexSecs, querySecs, recall, nCands)
  }

  def main(args: Array[String]): Unit = {
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
    graft.plans.GraftExtensions.register(spark)

    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "400000").toLong
    val clusters = sys.env.getOrElse("SPARK_GRAFT_ANN_CLUSTERS", "4096").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_Q", "100").toInt
    // IVF coarse-cell count ~ sqrt(N): bounds both the broadcast centroid
    // table and the per-cell population (same scaling as the catalog docs)
    val nCells = math.max(16, math.sqrt(n.toDouble).toInt)

    for (clustered <- Seq(true, false)) {
      val regime = if (clustered) "clustered" else "uniform"
      // materialize the input once outside every timed region
      val vecs = planted(spark, n, clusters, clustered)
        .repartition(cpus.toInt).persist()
      vecs.count()
      val queries = broadcast(vecs.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      println(s"[annbench] regime=$regime n=$n dim=$Dim q=$nQ " +
        s"planes=${graft.queries.SimilarityQueries.planeCountFor(n)} cells=$nCells")

      // ground truth + brute baseline: every query scores all N
      val tB0 = System.nanoTime()
      val bruteCands = vecs.crossJoin(queries).filter(col("vec_id") =!= col("q_id"))
      val truth = topk(bruteCands).persist()
      truth.count()
      val bruteSecs = (System.nanoTime() - tB0) / 1e9
      println(s"[annbench] $regime brute: query=${fmt(bruteSecs)}s " +
        s"~${n} candidates/query (ground truth)")

      // LSH index: derived plane count, bucket per vector (bucketedK's law)
      val planes = graft.queries.SimilarityQueries.planeCountFor(n)
      val tL0 = System.nanoTime()
      val bucketed = vecs
        .select(col("vec_id"), col("embedding"),
          posexplode(typedLit(graft.queries.SimilarityQueries.planesFor(planes)))
            .as(Seq("pj", "plane")))
        .select(col("vec_id"), col("embedding"), col("pj"),
          call_function("vec_dot", col("embedding"), col("plane")).as("dotp"))
        .groupBy("vec_id")
        .agg(first(col("embedding")).as("embedding"),
          sum(when(col("dotp") > 0, call_function("shiftleft", lit(1L), col("pj")))
            .otherwise(0L)).as("bucket"))
        .persist()
      bucketed.count()
      val lshIndexSecs = (System.nanoTime() - tL0) / 1e9
      val qBuckets = broadcast(bucketed.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("bucket").as("q_bucket")))

      val single = measure(s"$regime lsh-single", truth, nQ, lshIndexSecs,
        bucketed.join(qBuckets,
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id")))

      val probes = col("q_bucket") +:
        (0 until planes).map(j => col("q_bucket").bitwiseXOR(lit(1L << j)))
      val multi = measure(s"$regime lsh-multiprobe", truth, nQ, lshIndexSecs,
        bucketed.join(
          qBuckets.select(col("q_id"), col("q_emb"),
            explode(array(probes: _*)).as("pb")),
          col("bucket") === col("pb") && col("vec_id") =!= col("q_id")))

      // IVF index: sqrt(N) sampled coarse centroids, argmax-cosine cells —
      // the LARGE-nlist regime of the family. The catalog's sim_ivf_topk
      // runs the fixed-SMALL-k learned quantizer as a plan-literal
      // projection (zero shuffle); at sqrt(N)=632+ centroids the literal
      // plan would be a megabyte codegen unit, so here centroids are a
      // broadcast TABLE and assignment is a map-side-combinable max_by
      // groupBy, NOT an N×cells window (the window's per-vector partitions
      // would shuffle the whole scoring frame). Identical argmax
      // semantics: highest ccos, lowest cid.
      val tI0 = System.nanoTime()
      val step = math.max(1L, n / nCells)
      val cents = broadcast(vecs.filter(col("vec_id") % step === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb")))
      val cellOf = vecs.crossJoin(cents)
        .select(col("vec_id"), col("cid"),
          cosCol(col("embedding"), col("c_emb")).as("ccos"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("c_cid"))
      val cells = vecs.join(cellOf, "vec_id")
        .select(col("vec_id"), col("embedding"), col("c_cid"))
        .persist()
      cells.count()
      val ivfIndexSecs = (System.nanoTime() - tI0) / 1e9
      // query probes: nQ×cells rows only — a window is fine at that size
      val cw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
      val qAssign = vecs.filter(col("vec_id") < nQ).crossJoin(cents)
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosCol(col("embedding"), col("c_emb")).as("ccos"))
        .withColumn("crn", row_number().over(cw))
      val ivfRuns = Seq(1, 2, 4).map { nprobe =>
        val qCells = broadcast(qAssign.filter(col("crn") <= nprobe)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("cid")))
        measure(s"$regime ivf-nprobe$nprobe", truth, nQ, ivfIndexSecs,
          cells.join(qCells,
            col("c_cid") === col("cid") && col("vec_id") =!= col("q_id")))
      }

      // PQ/ADC (sim_pq_adc_topk's law at bench scale, k=256 codebooks): the
      // scan never touches the float column — 4 codes per vector + literal
      // codebooks carry the whole candidate-scoring stage. Two variants:
      // raw ADC top-k (quantized ranking only) and the standard deployment
      // shape ADC-shortlist(4×k) → exact rerank.
      val pqM = 4; val pqSub = Dim / pqM; val pqK = 256
      val tP0 = System.nanoTime()
      val micros = vecs.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000000)).cast("long")).as("v"))
      // k=256 codebooks are past the comfortable literal-argmin plan (the
      // 4×256-struct projection is a multi-minute Janino unit) — this is
      // exactly the large-k regime fitCentroidTable exists for: centroids
      // live in a broadcast table, assignment is a join + struct-min agg,
      // triangle pruning on. Codes = the final assignment of each subspace.
      val pqFits = (0 until pqM).map { m =>
        graft.operators.KMeans.fitCentroidTable(
          micros.select(col("vec_id"), slice(col("v"), m * pqSub + 1, pqSub).as("v")),
          "vec_id", "v", k = pqK, passes = 2, prune = true)
      }
      val pqCodes = pqFits.zipWithIndex.map { case ((a, _), m) =>
        a.select(col("id").as("vec_id"), col("cluster").as(s"code$m"))
      }.reduce(_.join(_, "vec_id")).persist()
      pqCodes.count()
      val pqIndexSecs = (System.nanoTime() - tP0) / 1e9
      // codebooks collected AFTER the fits for the ADC literal lookup —
      // k×subdim longs per subspace; keyed maps (empty clusters leave gaps)
      val pqBooks = pqFits.map { case (_, c) =>
        c.collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap }
      val pqQ = broadcast(micros.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("v").as("qv")))
      val adcD2 = (0 until pqM).map(m => call_function("vec_l2sq",
        slice(col("qv"), m * pqSub + 1, pqSub),
        element_at(typedlit(pqBooks(m)), col(s"code$m"))))
        .reduce(_ + _)
      val adcScored = pqCodes.join(pqQ, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), adcD2.as("adc_d2"))
      val aw = Window.partitionBy("q_id").orderBy(col("adc_d2"), col("vec_id"))
      // raw ADC top-k: quantized ranking, no float reads at all
      val tQ0 = System.nanoTime()
      val adcTop = adcScored.withColumn("rn", row_number().over(aw))
        .filter(col("rn") <= TopK).select("q_id", "vec_id").persist()
      adcTop.count()
      val adcQuerySecs = (System.nanoTime() - tQ0) / 1e9
      val adcHits = adcTop.join(truth, Seq("q_id", "vec_id")).count()
      val adcRecall = adcHits.toDouble / (nQ.toLong * TopK)
      adcTop.unpersist(blocking = false)
      println(s"[annbench] $regime pq-adc: recall@$TopK=${fmt(adcRecall)} " +
        s"index=${fmt(pqIndexSecs)}s query=${fmt(adcQuerySecs)}s " +
        s"~$n candidates/query (coded scan, ${pqM}B/vec vs ${Dim * 4}B)")
      // ADC shortlist (4×k) → exact rerank: the deployment shape; measure()
      // exact-scores the shortlist like every other method
      val shortlist = adcScored.withColumn("rn", row_number().over(aw))
        .filter(col("rn") <= 4 * TopK).select("q_id", "vec_id")
      val rerank = measure(s"$regime pq-rerank", truth, nQ, pqIndexSecs,
        shortlist
          .join(vecs, "vec_id")
          .join(queries.select(col("q_id"), col("q_emb")), "q_id"))
      pqCodes.unpersist(blocking = false)

      // recall is monotone in the candidate set (methods rank by exact
      // cos), so these orderings are laws, not luck
      require(multi.recall >= single.recall,
        s"multi-probe recall ${multi.recall} < single-probe ${single.recall}")
      require(ivfRuns.map(_.recall).sliding(2).forall(p => p(1) >= p(0) - 1e-9),
        s"ivf recall not monotone in nprobe: ${ivfRuns.map(_.recall)}")
      // every raw-ADC hit is a shortlist member that exact rerank must also
      // rank into the top-k (≤ k−1 better exact candidates exist globally
      // for a true neighbor), so this ordering is a law too
      require(rerank.recall >= adcRecall - 1e-9,
        s"pq rerank recall ${rerank.recall} < raw ADC $adcRecall")

      truth.unpersist(blocking = false)
      vecs.unpersist(blocking = false)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
