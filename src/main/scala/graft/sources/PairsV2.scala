package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the reference's `x y` pair format
  * (`/root/reference/kernel.cu:92-104`) — the stdin ingest surface as a
  * FIRST-CLASS Spark source:
  *
  * {{{
  * spark.read.format("graft.sources.PairsV2").load("/path/to/pairs")
  * }}}
  *
  * Demonstrates the `org.apache.spark.sql.connector` extension surface
  * the engine builds on when built-in sources don't fit: TableProvider
  * → Table(SupportsRead) → ScanBuilder(column pruning) → Batch with one
  * InputPartition per file → PartitionReader parsing rows off-heap-free
  * into InternalRow. Column pruning is pushed into the reader: a query
  * touching only `x` never materializes `y` (PairsSpec asserts the
  * pruned read schema). Malformed lines are dropped, matching
  * [[PairSource.readPairs]]'s DROPMALFORMED policy.
  *
  * Scale notes: files are listed once on the driver and parallelized
  * per file (the pair format is newline-delimited, so a production
  * source would additionally split large files by byte range at line
  * boundaries and thread Hadoop FileSystem credentials; this
  * implementation reads local/POSIX paths, which is what the test
  * container provides).
  */
class PairsV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PairSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PairsTable(properties.get("path"))
}

private[sources] class PairsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_pairs($path)"
  override def schema(): StructType = PairSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PairsScanBuilder(Option(path).getOrElse(options.get("path")))
}

private[sources] class PairsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PairSource.schema

  /** Spark hands the pruned schema here; the readers below materialize
    * ONLY these columns. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // fail fast at planning time with a clear message instead of an
    // NPE (missing path option) or a reader-side FileNotFoundException
    require(path != null, "graft.sources.PairsV2 requires a 'path' option " +
      "(e.g. spark.read.format(\"graft.sources.PairsV2\").load(dir))")
    require(new java.io.File(path).exists(),
      s"graft.sources.PairsV2 path does not exist: $path")
    new PairsScan(path, required)
  }
}

private[sources] case class PairsFilePartition(file: String) extends InputPartition

private[sources] class PairsScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(x => x.isFile && !x.getName.startsWith("_")
          && !x.getName.startsWith(".")).map(_.getPath).sorted
      else Array(path)
    files.map(PairsFilePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PairsReaderFactory(required.fieldNames)
}

private[sources] class PairsReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PairsFileReader(p.asInstanceOf[PairsFilePartition].file, columns)
}

/** Streams one file line by line; never holds the file in memory. */
private[sources] class PairsFileReader(file: String, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new java.io.FileInputStream(file), "UTF-8"))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val parts = line.trim.split("\\s+")
      if (parts.length == 2) {
        try {
          val x = parts(0).toDouble
          val y = parts(1).toDouble
          // materialize only the pruned columns, in requested order
          val values = new Array[Any](columns.length)
          var i = 0
          while (i < columns.length) {
            values(i) = if (columns(i) == "x") x else y
            i += 1
          }
          row = new GenericInternalRow(values)
          return true
        } catch {
          case _: NumberFormatException => () // DROPMALFORMED parity
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
