package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join: the explicit answer to JOIN-side hot-key skew, the sibling
  * of [[SaltedAgg]] (aggregation-side skew).
  *
  * A shuffle join on a skewed key sends every row of the hot key to ONE
  * reducer — at 100 TB a single task owns the whole hot partition and the
  * stage runs at the speed of that straggler. Salting restores parallelism
  * structurally: the big side gets a salt in [0, buckets), the small side is
  * replicated once per salt value, and the join key becomes (key, salt) —
  * the hot key's rows spread over `buckets` reducers while every row still
  * meets its small-side match (which now exists under every salt).
  *
  * Correct for any join where the replicated side is duplicate-free per key
  * BY CONSTRUCTION here: inner joins only, small side replicated exactly
  * `buckets` times, each big-side row carries exactly one salt — so each
  * (big row, small row) pair meets exactly once and the result multiset
  * equals the unsalted join's (OperatorSpec pins this on a skewed fixture).
  *
  * AQE's skew-join split handles sort-merge joins adaptively at runtime;
  * structural salting remains the tool when the skew is KNOWN (a universal
  * group like the reference's `all`, a null-heavy foreign key) or when the
  * join is hash-based where AQE's splitter doesn't apply. The salt reuses
  * [[SaltedAgg]]'s retry-deterministic construction (hash of row + partition
  * id — stable under task retries, unlike monotonically_increasing_id).
  *
  * Degraded-spread edge case: the salt hashes the big side's hashable
  * columns plus the partition id, so rows that are BYTE-IDENTICAL within an
  * input partition (e.g. the big side carries only the join key, or true
  * duplicate rows) collapse to one salt per partition — spread is then
  * bounded by the input partition count, not `buckets`. Correctness is
  * unaffected. If that regime applies, `repartition` the big side to >=
  * `buckets` partitions first, or keep a distinguishing column in scope;
  * a per-partition row counter is deliberately NOT mixed in because it
  * would trade retry-determinism for spread.
  */
object SaltedJoin {

  /** Inner-join `big` to `small` on equal `keys`, spreading each key's rows
    * over `buckets` reducers. `small` must be duplicate-free per key for
    * multiset equality with the plain join (true of any dimension table). */
  def inner(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val saltCol = "_graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"column $saltCol already exists")
    // salt from ALL hashable columns (keys included) + partition id: rows
    // of the SAME key land on
    // different salts (hashing only the key would put the hot key back on
    // one reducer)
    val hashable = {
      import org.apache.spark.sql.types.{ArrayType, DataType, MapType,
        StructType, VariantType}
      def unhashable(dt: DataType): Boolean = dt match {
        case _: MapType | _: VariantType => true
        case s: StructType => s.fields.exists(f => unhashable(f.dataType))
        case a: ArrayType => unhashable(a.elementType)
        case _ => false
      }
      big.schema.fields.filterNot(f => unhashable(f.dataType)).map(f => col(f.name))
    }
    val salted = big.withColumn(saltCol,
      pmod(hash((hashable :+ spark_partition_id()): _*), lit(buckets)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
