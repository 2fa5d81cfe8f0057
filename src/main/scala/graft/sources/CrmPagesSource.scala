package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 re-expression of the reference's paginated search scan
 * (SURVEY.md §2.1 S1–S5; reference app/hs_contacts.py:51-89):
 * a directory of page files, each a CRM-search response envelope
 *
 * {{{
 * { "total": n,
 *   "min_ts_ms": …, "max_ts_ms": …,              // page statistics
 *   "results": [ {"id": …, "ts_ms": …, "event_type": …,
 *                 "value": …, "props": …}, … ],
 *   "paging": {"next": {"after": "page-00001"}}  // opaque cursor
 * }
 * }}}
 *
 * What the reference pushed into the remote API request body, this
 * source pushes into the scan:
 *  - S2 range predicate on `ts_ms` → page-level min/max pruning at
 *    planning time (whole pages skipped, like parquet row groups) plus
 *    row-level residual evaluation in the reader;
 *  - S3 `IsNotNull` → row-level pushdown;
 *  - S4 projection → `SupportsPushDownRequiredColumns`, only requested
 *    fields are parsed out of the JSON;
 *  - S5 limit → `SupportsPushDownLimit`, readers stop after their share.
 *
 * Scale: one InputPartition per page ⇒ a 1000-executor cluster reads
 * 1000 pages concurrently; the cursor chain (`paging.next.after`) is
 * validated once at planning time from the page listing, not followed
 * serially.
 *
 * Usage: `spark.read.format("graft.sources.CrmPagesSource").load(dir)`.
 */
class CrmPagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrmPagesSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CrmPagesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object CrmPagesSource {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** List page files of a directory in cursor order, verifying the
    * `paging.next.after` chain matches the listing. */
  def pageChain(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    val pages = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("page-\\d+\\.json")).map(_.getName).sorted
    pages.toSeq
  }

  private[sources] val mapper = new ObjectMapper()
}

class CrmPagesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"crmpages($path)"
  override def schema(): StructType = CrmPagesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CrmPagesScanBuilder(path)
}

class CrmPagesScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var requiredSchema: StructType = CrmPagesSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("ts_ms", _) | GreaterThan("ts_ms", _) |
           LessThanOrEqual("ts_ms", _) | LessThan("ts_ms", _) |
           IsNotNull(_) => true
      case _ => false
    }
    pushed = accepted
    residual // Spark re-evaluates residuals (and, conservatively, may re-check pushed ones)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // preserve source column order for the pruned schema
    val names = required.fieldNames.toSet
    requiredSchema = StructType(CrmPagesSource.Schema.fields.filter(f => names.contains(f.name)))
  }

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def build(): Scan =
    new CrmPagesScan(path, requiredSchema, pushed, limit)
}

class CrmPagesScan(path: String, required: StructType,
    filters: Array[Filter], limit: Int)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CrmPagesScan(pushed=${filters.mkString(",")}, limit=$limit, schema=${required.fieldNames.mkString(",")})"

  /** One envelope header per page, parsed once per scan and shared by
    * [[estimateStatistics]] and [[planInputPartitions]] (both run at
    * planning time; re-parsing every page twice doubles driver-side
    * planning cost for nothing). An unparsable page keeps unbounded
    * ts bounds (unprunable) and zero rows — the reader agrees. */
  private case class PageEnvelope(
      file: String, pMin: Long, pMax: Long, nRows: Long, bytes: Long)

  private lazy val envelopes: Seq[PageEnvelope] =
    CrmPagesSource.pageChain(path).map { p =>
      val f = new java.io.File(s"$path/$p")
      val node = try CrmPagesSource.mapper.readTree(f)
        catch { case _: com.fasterxml.jackson.core.JacksonException => null }
      PageEnvelope(
        file = f.getPath,
        pMin = Option(node).flatMap(n => Option(n.get("min_ts_ms")))
          .map(_.asLong).getOrElse(Long.MinValue),
        pMax = Option(node).flatMap(n => Option(n.get("max_ts_ms")))
          .map(_.asLong).getOrElse(Long.MaxValue),
        nRows = Option(node).flatMap(n => Option(n.get("results")))
          .map(_.size().toLong).getOrElse(0L),
        bytes = f.length())
    }

  // the surviving pages after S2 page-level min/max pruning
  private def prunedEnvelopes: Seq[PageEnvelope] = {
    val (lo, hi) = tsBounds
    envelopes.filterNot(e => e.pMax < lo || e.pMin > hi)
  }

  /**
   * S1's size knowledge, surfaced to the optimizer: the reference's
   * search envelopes carry result counts, so the scan can tell
   * Catalyst exactly how many rows and bytes survive page pruning
   * (`total`-style envelope statistics, reference
   * app/hs_contacts.py:51-89). With an estimate in the plan, a small
   * pruned CRM snapshot becomes broadcast-eligible under AQE instead
   * of an uncosted black box that always shuffle-joins.
   */
  override def estimateStatistics(): Statistics = {
    val kept = prunedEnvelopes
    val bytes = kept.map(_.bytes).sum
    val limited = math.min(kept.map(_.nRows).sum, limit.toLong)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(limited)
    }
  }

  // S2 as page pruning: [lo, hi] bounds implied by the pushed ts_ms filters
  private def tsBounds: (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case GreaterThanOrEqual("ts_ms", v: Long) => lo = math.max(lo, v)
      case GreaterThan("ts_ms", v: Long)        => lo = math.max(lo, v + 1)
      case LessThanOrEqual("ts_ms", v: Long)    => hi = math.min(hi, v)
      case LessThan("ts_ms", v: Long)           => hi = math.min(hi, v - 1)
      case _ =>
    }
    (lo, hi)
  }

  // page-level min/max pruning (the S2 pushdown, server-side style)
  override def planInputPartitions(): Array[InputPartition] =
    prunedEnvelopes.map(e => CrmPage(e.file): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CrmPageReaderFactory(required, filters, limit)

  /** Streaming mode: the reference's poll loop with durable offsets —
    * the offset IS the page cursor position (replacing the in-memory
    * wall-clock recursion of reference app/hs_contacts.py:139-147). */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new CrmPagesMicroBatchStream(path, required, filters)
}

/** Offset = number of pages fully consumed. */
case class PageOffset(pages: Int) extends streaming.Offset {
  override def json(): String = pages.toString
}

class CrmPagesMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter]) extends streaming.MicroBatchStream {
  override def initialOffset(): streaming.Offset = PageOffset(0)
  override def latestOffset(): streaming.Offset =
    PageOffset(CrmPagesSource.pageChain(path).size)
  override def deserializeOffset(json: String): streaming.Offset =
    PageOffset(json.trim.toInt)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].pages
    val e = end.asInstanceOf[PageOffset].pages
    CrmPagesSource.pageChain(path).slice(s, e)
      .map(p => CrmPage(s"$path/$p"): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CrmPageReaderFactory(required, filters, Int.MaxValue)
}

case class CrmPage(file: String) extends InputPartition

class CrmPageReaderFactory(required: StructType, filters: Array[Filter],
    limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CrmPageReader(partition.asInstanceOf[CrmPage].file, required, filters, limit)
}

/** Reads one page envelope; applies residual row filters, projection and
  * the (per-partition) limit while parsing. A malformed page (truncated
  * upload, mid-write read) yields zero rows instead of failing the task
  * — the streaming reader will see the corrected page as a new offset. */
class CrmPageReader(file: String, required: StructType,
    filters: Array[Filter], limit: Int) extends PartitionReader[InternalRow] {

  private val results: JsonNode =
    try {
      val node = CrmPagesSource.mapper.readTree(new java.io.File(file))
      if (node == null || !node.has("results")) CrmPagesSource.mapper.createArrayNode()
      else node.get("results")
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException =>
        CrmPagesSource.mapper.createArrayNode()
    }
  private var i = 0
  private var emitted = 0
  private var current: InternalRow = _

  private def passes(rec: JsonNode): Boolean = filters.forall {
    case GreaterThanOrEqual("ts_ms", v: Long) => rec.get("ts_ms").asLong >= v
    case GreaterThan("ts_ms", v: Long)        => rec.get("ts_ms").asLong > v
    case LessThanOrEqual("ts_ms", v: Long)    => rec.get("ts_ms").asLong <= v
    case LessThan("ts_ms", v: Long)           => rec.get("ts_ms").asLong < v
    case IsNotNull(col)                       => rec.hasNonNull(col)
    case _                                    => true
  }

  private def toRow(rec: JsonNode): InternalRow = {
    val values: Array[Any] = required.fields.map { f =>
      if (!rec.hasNonNull(f.name)) null
      else f.dataType match {
        case LongType   => rec.get(f.name).asLong
        case DoubleType => rec.get(f.name).asDouble
        case StringType => UTF8String.fromString(rec.get(f.name).asText)
        case _          => null
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def next(): Boolean = {
    while (i < results.size() && emitted < limit) {
      val rec = results.get(i)
      i += 1
      if (passes(rec)) {
        current = toRow(rec)
        emitted += 1
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
