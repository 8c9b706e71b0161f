package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A REAL custom DataSource-V2 connector hosting the `locations` contract —
  * the architectural element the reference implements as hardcoded Cassandra/
  * CosmosDB endpoints (heatmap.py:131–147). Registered as `graft-locations`
  * (META-INF/services), it reads a directory of `*.loc` line files:
  *
  *   latitude,longitude,source,user_id,epochMillis
  *
  * The format itself is deliberately trivial; what it demonstrates is the
  * engine hosting a NON-built-in source through the full DSv2 seam:
  *
  *   - `TableProvider`/`Table` with a fixed schema (the locations contract),
  *   - one `InputPartition` per file → parallel, executor-side reads (no
  *     driver materialization; at scale, files = the unit of work exactly
  *     like a real log-store connector),
  *   - `SupportsPushDownRequiredColumns`: column pruning reaches the reader,
  *     which parses ONLY the requested fields (StorageSpec asserts the
  *     pruned read schema),
  *   - epoch-millis → TimestampType conversion inside the reader, so
  *     downstream plans see the contract schema directly.
  */
class GraftLocationsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-locations"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLocationsTable.tableSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLocationsTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-locations requires a path")))
}

object GraftLocationsTable {
  /** The locations contract (FIXTURES.md §A) — timestamp surfaces as a real
    * TimestampType even though the wire format carries epoch millis. */
  val tableSchema: StructType = new StructType()
    .add("latitude", DoubleType)
    .add("longitude", DoubleType)
    .add("source", StringType)
    .add("user_id", StringType)
    .add("timestamp", TimestampType)
}

class GraftLocationsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-locations(`$path`)"
  override def schema(): StructType = GraftLocationsTable.tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLocationsScanBuilder(path)
}

class GraftLocationsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftLocationsTable.tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftLocationsScan(path, required)
}

class GraftLocationsScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-locations $path [${required.fieldNames.mkString(",")}]"

  /** One partition per `*.loc` file — executors read files independently,
    * the driver only lists names (the same split model as a file-store or
    * log-segment connector; at 100 TB the listing itself would page). */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"graft-locations path is not a directory: $path")
    val files = Option(dir.listFiles((_, n) => n.endsWith(".loc"))).getOrElse(
      throw new java.io.IOException(s"graft-locations cannot list $path"))
    files.sortBy(_.getName)
      .map(f => GraftLocationsPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLocationsReaderFactory(required.fieldNames)
}

case class GraftLocationsPartition(file: String) extends InputPartition

class GraftLocationsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftLocationsReader(
      partition.asInstanceOf[GraftLocationsPartition].file, fields)
}

/** Line-at-a-time reader projecting ONLY the pruned columns. Empty fields
  * read as null; a malformed line fails loudly with file/line context. */
class GraftLocationsReader(file: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val src = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = src.getLines().zipWithIndex
    .filter { case (l, _) => l.nonEmpty }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      // getLines() is readLine-based: \n, \r\n, and lone \r terminators are
      // already stripped, so fields never carry line-ending characters
      val (line, idx) = lines.next()
      val p = line.split(",", -1)
      require(p.length == 5,
        s"malformed locations line $file:${idx + 1}: expected 5 fields, " +
          s"got ${p.length} in '$line'")
      def opt(i: Int): Option[String] = if (p(i).isEmpty) None else Some(p(i))
      try current = InternalRow.fromSeq(fields.map[Any] {
        case "latitude"  => opt(0).map(s => s.toDouble: java.lang.Double).orNull
        case "longitude" => opt(1).map(s => s.toDouble: java.lang.Double).orNull
        case "source"    => opt(2).map(UTF8String.fromString).orNull
        case "user_id"   => opt(3).map(UTF8String.fromString).orNull
        case "timestamp" => // ms → µs
          opt(4).map(s => (s.toLong * 1000L): java.lang.Long).orNull
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }.toSeq)
      catch {
        case e: NumberFormatException => throw new IllegalArgumentException(
          s"malformed locations line $file:${idx + 1}: ${e.getMessage} in '$line'", e)
      }
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
