package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SequencePacking

/** Invariants of the sequence-packing flavors beyond what the DuckDB gate
  * checks doc-for-doc: conservation (every positive-token doc placed
  * exactly once), window-capacity laws, and the greedy recurrence's
  * boundary behavior including truncation. */
class SequencePackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 64L
  private def docs = spark.range(0, 300)
    .select(col("id").as("doc_id"),
      // deterministic spread 1..100, with doc 7 forced oversize (> L) and
      // doc 13 forced to exactly L (boundary fit)
      when(col("id") === 7, 150L)
        .when(col("id") === 13, L)
        .otherwise(col("id") % 100 + 1).as("n_tok"))

  test("packChunks places every doc once, contiguously, within-shard") {
    val out = SequencePacking.packChunks(docs, "n_tok", L, shards = 8)
      .collect()
    assert(out.length === 300)
    assert(out.map(_.getLong(0)).distinct.length === 300)
    // per shard: pack orders are 1..n and the concatenated stream is
    // gap-free (cum_before of pack_order k = sum of tokens before it),
    // which (seq_first, tok_offset) must encode exactly
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq === (1L to sorted.length))
      var cum = 0L
      sorted.foreach { r =>
        val (nTok, seqFirst, seqLast, off) =
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(seqFirst === cum / L)
        assert(off === cum % L)
        assert(seqLast === (cum + nTok - 1) / L)
        cum += nTok
      }
    }
  }

  test("packStats windows hold exactly seqLen tokens except each shard's last") {
    val stats = SequencePacking.packStats(docs, "n_tok", L, shards = 8)
      .collect()
    stats.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // contiguous window ids from 0
      assert(sorted.map(_.getLong(1)).toSeq === (0L until sorted.length))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val (nTokens, isFull) = (r.getLong(4), r.getBoolean(5))
        if (i < sorted.length - 1) {
          assert(nTokens === L, s"interior window $i not full")
          assert(isFull)
        } else assert(nTokens <= L && nTokens > 0)
      }
    }
    // token conservation: windows hold exactly the corpus's token mass
    val total = docs.agg(sum("n_tok")).as[Long].head()
    assert(stats.map(_.getLong(4)).sum === total)
  }

  test("packGreedy: no window over capacity, no doc split, truncation flagged") {
    val out = SequencePacking.packGreedy(docs, "n_tok", L, shards = 8)
      .collect()
    assert(out.length === 300)
    assert(out.map(_.doc_id).distinct.length === 300)
    val nTokOf = docs.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { p =>
      assert(p.tok_start + p.tokens_used <= L,
        s"doc ${p.doc_id} overflows its window")
      assert(p.tokens_used === math.min(nTokOf(p.doc_id), L))
      assert(p.truncated === (nTokOf(p.doc_id) > L),
        s"doc ${p.doc_id} truncation flag wrong")
    }
    // the oversize doc occupies a full window alone
    val big = out.find(_.doc_id == 7L).get
    assert(big.tokens_used === L && big.tok_start === 0L)
    assert(!out.exists(p => p.doc_id != 7L && p.shard == big.shard &&
      p.seq_id == big.seq_id))
    // within each (shard, seq): positions 0..n-1 and token ranges abut
    out.groupBy(p => (p.shard, p.seq_id)).foreach { case (_, ps) =>
      val sorted = ps.sortBy(_.pos_in_seq)
      assert(sorted.map(_.pos_in_seq).toSeq === (0L until sorted.length))
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b.tok_start === a.tok_start + a.tokens_used)
        case _ => ()
      }
    }
    // next-fit law: a doc opens a new window ONLY if it did not fit the
    // previous write position — verified per shard in pack order
    out.groupBy(_.shard).foreach { case (_, ps) =>
      val seqs = ps.sortBy(p => (p.seq_id, p.pos_in_seq))
      seqs.toSeq.sliding(2).foreach {
        case Seq(a, b) if b.seq_id == a.seq_id + 1 =>
          assert(a.tok_start + a.tokens_used + b.tokens_used > L,
            s"doc ${b.doc_id} opened a window it didn't need")
        case _ => ()
      }
    }
  }

  test("packing drops zero-token docs and keeps determinism across repartition") {
    val withEmpty = docs.union(Seq((1000L, 0L)).toDF("doc_id", "n_tok"))
    assert(SequencePacking.packChunks(withEmpty, "n_tok", L, 8).count() === 300)
    val a = SequencePacking.packGreedy(docs, "n_tok", L, 8)
      .collect().sortBy(_.doc_id).toSeq
    val b = SequencePacking.packGreedy(docs.repartition(7), "n_tok", L, 8)
      .collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }
}
