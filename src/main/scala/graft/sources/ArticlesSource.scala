package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 stand-in for the reference's external REST source
  * (news_producer.py:62-70: NewsAPI `get_everything`, paged) — the S4
  * surface brought IN-engine as a first-class table provider instead of
  * an out-of-process poll loop:
  *
  *   spark.read.format("graft-articles")
  *     .option("pages", 5).option("pageSize", 20).option("query", "bitcoin")
  *     .load()
  *
  * Layout mirrors the API: one InputPartition PER PAGE, so a 1000-page
  * backfill fans out across executors with no driver-side loop — the
  * scale story for REST ingestion is page-range partitioning, and this
  * is it. Articles are generated deterministically from (page, index)
  * — md5-free arithmetic only — standing in for the HTTP call exactly
  * where a real client would plug into [[ArticlesPartitionReader]]
  * (one "connection" per partition, U3's init discipline; the sandbox
  * has no egress, so the fetch itself is simulated, the connector
  * machinery is real).
  *
  * Schema = the producer's fetch fields (news_producer.py:126-133),
  * i.e. [[graft.streaming.IngestSim.fetchSchema]] — so the source
  * composes directly with IngestSim's dedup/projection and the entity
  * pipeline (asserted end to end in ArticlesSourceSpec).
  */
class ArticlesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-articles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArticlesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArticlesTable(new CaseInsensitiveStringMap(properties))
}

object ArticlesSource {
  val schema: StructType = graft.streaming.IngestSim.fetchSchema

  /** Deterministic fake article for (page, idx) — the seam where a real
    * HTTP response row would be mapped.
    */
  def article(page: Int, idx: Int, query: String): Seq[String] = {
    val id = page * 1000 + idx
    // ~10% duplicate urls, like a real paged feed re-serving stories
    val urlId = if (id % 10 == 9) id - 1 else id
    Seq(
      s"""{"id":null,"name":"source-${id % 7}"}""",
      s"author-${id % 13}",
      s"$query Headline$id joins the stream",
      s"description $id",
      s"http://news.example/$urlId",
      // monotone in id (one article per minute from 2024-01-01): pages
      // arrive in publish order, as a real feed does — event-time
      // watermarks downstream stay meaningful
      java.time.Instant.ofEpochSecond(1704067200L + id * 60L).toString,
      s"content $id about $query",
    )
  }
}

private class ArticlesTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_articles"
  override def schema(): StructType = ArticlesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ArticlesScan(
      o.getInt("pages", 1), o.getInt("pageSize", 20),
      o.getOrDefault("query", "bitcoin"),
      o.getInt("pagesPerTrigger", 1))
}

private class ArticlesScan(pages: Int, pageSize: Int, query: String,
                           pagesPerTrigger: Int)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ArticlesSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (1 to pages).map(p => ArticlesPage(p, pageSize, query): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArticlesReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ArticlesMicroBatch(pages, pageSize, query, pagesPerTrigger)
}

/** Streaming form — the reference's poll loop as a MicroBatchStream:
  * the offset IS the page counter (news_producer.py:150-153's
  * `page += 1`), each trigger advances by at most `pagesPerTrigger`
  * (ST8's rate cap enforced at the connector, the same place Kafka's
  * maxOffsetsPerTrigger lives), and the stream drains once `pages` is
  * reached, so tests and AvailableNow-style backfills terminate.
  * Offsets are committed/restored by the engine via their JSON form,
  * so checkpoint recovery resumes at the right page for free.
  */
private case class PageOffset(page: Int) extends Offset {
  override def json(): String = page.toString
}

private class ArticlesMicroBatch(pages: Int, pageSize: Int, query: String,
                                 pagesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = PageOffset(0)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toInt)
  // Admission control carries the rate cap (the same seam Kafka's
  // maxOffsetsPerTrigger uses): each trigger admits at most
  // pagesPerTrigger pages past the committed offset, and the stream
  // reports no new data once the page budget is exhausted.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    PageOffset(math.min(start.asInstanceOf[PageOffset].page + pagesPerTrigger, pages))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = PageOffset(pages)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: the engine calls latestOffset(start, limit)")
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PageOffset].page
    val until = end.asInstanceOf[PageOffset].page
    (from + 1 to until).map(p => ArticlesPage(p, pageSize, query): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArticlesReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class ArticlesPage(page: Int, pageSize: Int, query: String)
    extends InputPartition

private class ArticlesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArticlesPartitionReader(p.asInstanceOf[ArticlesPage])
}

/** One reader per page-partition — a real implementation opens its HTTP
  * client here (once per partition, not per row).
  */
private class ArticlesPartitionReader(p: ArticlesPage)
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < p.pageSize }
  override def get(): InternalRow =
    InternalRow.fromSeq(
      ArticlesSource.article(p.page, i, p.query).map(UTF8String.fromString))
  override def close(): Unit = ()
}
