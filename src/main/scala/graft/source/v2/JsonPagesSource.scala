package graft.source.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for paginated API responses (SURVEY.md §2.1 O1/O3/O10).
  *
  * The reference pages through the YouTube API driver-side, one HTTP call
  * per page (/root/reference/fetch_youtube_data.py:83-100) and one call
  * per 50-id chunk (:113-119). The scale-correct architecture is a V2
  * source whose InputPartitions each own one page/chunk: fetches run on
  * executors in parallel, and the 50-id batching lives inside the
  * partition reader.
  *
  * Offline (zero-egress sandbox), a "page" is a JSON file under `path`;
  * the partition reader's `fetch()` seam is where the HTTP call would go.
  * Register: spark.read.format("graft.source.v2.JsonPagesSource")
  *   .option("path", dir).load() → one `value: STRING` row per page, one
  * partition per page.
  */
class JsonPagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonPagesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagesTable(properties.get("path"))
}

object JsonPagesSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
  val Name = "graft.source.v2.JsonPagesSource"
}

private[v2] class PagesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"json_pages($path)"
  override def schema(): StructType = JsonPagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(path)
}

private[v2] class PagesScanBuilder(path: String) extends ScanBuilder with Scan
    with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = JsonPagesSource.schema
  override def toBatch: Batch = this

  /** One InputPartition per page file — the pagination unit becomes the
    * parallelism unit (at scale: per page-token / per 50-id chunk). */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Array.empty
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toArray.sortBy(_.getFileName.toString)
      .map(p => PagePartition(p.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory
}

private[v2] case class PagePartition(file: String) extends InputPartition

private[v2] class PagesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition].file)
}

private[v2] class PageReader(file: String)
    extends PartitionReader[InternalRow] {
  private var consumed = false
  private var page: String = _

  /** The fetch seam: offline it reads a file; live it would execute the
    * HTTP request for this partition's page token / id chunk. */
  private def fetch(): String =
    new String(Files.readAllBytes(Paths.get(file)), StandardCharsets.UTF_8)

  override def next(): Boolean =
    if (consumed) false
    else { page = fetch(); consumed = true; true }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(page))

  override def close(): Unit = ()
}
