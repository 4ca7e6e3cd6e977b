package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Paged match-ID client abstraction (reference: zwilson999/lol_data_pipeline
  * `matches.py:21-53` — GET `…/ids?queue=&start=&count=` pages of opaque IDs).
  * Implementations must be cheap to construct from options on executors;
  * the default [[FakeMatchIdClient]] is a deterministic in-memory stand-in
  * (zero-egress container) — an HTTP client drops in without touching the
  * planner below.
  */
trait MatchIdClient {
  def queues: Seq[Int]
  /** One page of IDs for a queue; fewer than `count` ⇔ last page. */
  def fetchPage(queue: Int, start: Int, count: Int): Seq[String]
}

/** Deterministic fake: `idsPerQueue` IDs per queue named like real match
  * IDs. Counts fetches (static, test-observable) so pushdown effects are
  * measurable, mirroring the reference's request accounting.
  */
class FakeMatchIdClient(val queues: Seq[Int], idsPerQueue: Int) extends MatchIdClient {
  def fetchPage(queue: Int, start: Int, count: Int): Seq[String] = {
    FakeMatchIdClient.fetches.incrementAndGet()
    val end = math.min(start + count, idsPerQueue)
    (start until end).map(i => f"NA1_$queue%03d_$i%07d")
  }
}
object FakeMatchIdClient {
  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** DataSourceV2 batch source for the paginated match-ID scan, with the
  * two pushdowns the reference hand-implements in its request layer
  * (SURVEY.md §2.1 S2, §4):
  *
  *  - `SupportsPushDownFilters`: `queue = v` / `queue IN (…)` predicates
  *    become the set of queues scanned — the `?queue=` query param.
  *  - `SupportsPushDownLimit`: a LIMIT caps the pages planned per queue
  *    (`?count=` + page cap). Partial push (`pushLimit` returns false):
  *    Spark still applies the exact global limit on top.
  *
  * One InputPartition per (queue, page): at cluster scale each page fetch
  * runs as its own task — the DSv2 analog of the reference's semaphore
  * fan-out (`pipeline.py:49-58`), with retries/pacing delegated to the
  * client implementation.
  *
  * Usage: `spark.read.format("graft.sources.MatchIdsSource")
  *   .option("queues", "400,430,450").option("idsPerQueue", 1000).load()`
  */
class MatchIdsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatchIdsSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MatchIdsTable(new CaseInsensitiveStringMap(properties))
}

object MatchIdsSource {
  val schema: StructType = StructType(Seq(
    StructField("queue", IntegerType, nullable = false),
    StructField("match_id", StringType, nullable = false)))

  private[sources] case class ClientConf(
      queues: Seq[Int], idsPerQueue: Int, baseUrl: Option[String] = None) {
    /** Runs executor-side per partition — a `baseUrl` option routes the
      * scan through [[HttpMatchIdClient]] (real sockets, pushdown params
      * in the query string); unset keeps the deterministic fake.
      */
    def make(): MatchIdClient = baseUrl match {
      case Some(u) => new HttpMatchIdClient(queues, u)
      case None => new FakeMatchIdClient(queues, idsPerQueue)
    }
  }

  private[sources] def conf(options: CaseInsensitiveStringMap): ClientConf = ClientConf(
    options.getOrDefault("queues", "400,430,450").split(",").map(_.trim.toInt).toSeq,
    options.getInt("idsPerQueue", 1000),
    Option(options.get("baseUrl")))
}

class MatchIdsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "match_ids"
  override def schema(): StructType = MatchIdsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new MatchIdsScanBuilder(MatchIdsSource.conf(options),
      opts.getInt("pageSize", 100), opts.getInt("maxPerQueue", 1000))
}

class MatchIdsScanBuilder(conf: MatchIdsSource.ClientConf, pageSize: Int, maxPerQueue: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private var queueSubset: Option[Set[Int]] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("queue", _: Int) | EqualTo("queue", _: Integer) => true
      case In("queue", _) => true
      case _ => false
    }
    queueSubset = supported.foldLeft(queueSubset) { (acc, f) =>
      val s = f match {
        case EqualTo(_, v) => Set(v.asInstanceOf[Number].intValue())
        case In(_, vs) => vs.map(_.asInstanceOf[Number].intValue()).toSet
        case _ => Set.empty[Int]
      }
      Some(acc.fold(s)(_ intersect s))
    }
    pushed = supported
    rest // unsupported predicates stay in the Spark plan
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Partial push: cap pages planned; Spark re-applies the exact limit. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def build(): Scan = {
    val queues = queueSubset.fold(conf.queues)(s => conf.queues.filter(s))
    val perQueueCap = math.min(maxPerQueue, limit.getOrElse(maxPerQueue))
    new MatchIdsScan(conf, queues, pageSize, perQueueCap, pushed)
  }
}

case class MatchIdsPartition(queue: Int, start: Int, count: Int) extends InputPartition

class MatchIdsScan(
    conf: MatchIdsSource.ClientConf, queues: Seq[Int],
    pageSize: Int, perQueueCap: Int, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = MatchIdsSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"MatchIdsScan queues=${queues.mkString(",")} cap=$perQueueCap " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val pages = (0 until perQueueCap by pageSize)
    queues.flatMap(q => pages.map(start =>
      MatchIdsPartition(q, start, math.min(pageSize, perQueueCap - start)))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val c = conf // avoid serializing the Scan
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[MatchIdsPartition]
      new PartitionReader[InternalRow] {
        private val ids = c.make().fetchPage(p.queue, p.start, p.count).iterator
        private var current: String = _
        override def next(): Boolean = { val h = ids.hasNext; if (h) current = ids.next(); h }
        override def get(): InternalRow =
          InternalRow(p.queue, UTF8String.fromString(current))
        override def close(): Unit = ()
      }
    }
  }
}
