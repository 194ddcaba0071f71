package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic bills source — `spark.read.format("graft.sources.BillsGen")`.
  *
  * The reference ingests bills from JSON-lines/Avro files (SURVEY §2.1 S1/S7,
  * reference ExtractCandidates.scala:98, dataformat/bills.avsc); this is the
  * same table as a FIRST-CLASS Spark connector, the shape a production bills
  * feed (API, change stream, row store) would take. It demonstrates the two
  * properties a 100 TB source must have, both machine-checked in
  * `BillsGenSourceSpec`:
  *
  *  - **source-side pushdown**: required-column pruning and
  *    state/year predicate pushdown reach the generator, so a query that
  *    selects 2 columns of 1 state materializes only those values — the DSv2
  *    analogue of Parquet's `PushedFilters`/`ReadSchema`;
  *  - **partition planning**: the row range splits into `numPartitions`
  *    independent `InputPartition`s, each generated executor-side from
  *    (seed, row index) alone — no driver materialization, embarrassingly
  *    parallel, deterministic under retry (a speculative re-run of a
  *    partition regenerates identical rows).
  *
  * Options: `rows` (default 1000), `numPartitions` (default 8), `seed`
  * (default 42). Schema matches SURVEY §1.2's bills table.
  */
class BillsGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BillsGen.SCHEMA

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BillsGenTable(new CaseInsensitiveStringMap(properties))
}

object BillsGen {
  val SCHEMA: StructType = StructType(Seq(
    StructField("primary_key", StringType, nullable = false),
    StructField("state", LongType, nullable = false),
    StructField("year", LongType, nullable = false),
    StructField("docid", StringType, nullable = false),
    StructField("docversion", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("content", StringType, nullable = false)))

  val VERSIONS: Array[String] = Array("Introduced", "Enacted", "Amended")
  private val WORDS: Array[String] = Array(
    "act", "section", "state", "law", "public", "amend", "provide", "county",
    "person", "tax", "school", "court", "fund", "board", "vehicle", "license")

  /** The splitmix64 finalizer every generated value derives from. Public so
    * the q_stream_bills_source oracle can embed mix(seed) as a literal and
    * replay the per-row mixing independently in SQL. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic row i under seed: a (state, year, docversion, content)
    * tuple derived from a splitmix-style hash — executor-side, retry-stable. */
  def row(i: Long, seed: Long): (String, Long, Long, String, String, Long, String) = {
    val h = mix(i ^ mix(seed))
    val state = java.lang.Long.remainderUnsigned(h, 50L)
    val year = 2000L + java.lang.Long.remainderUnsigned(h >>> 8, 20L)
    val docid = s"SB${java.lang.Long.remainderUnsigned(h >>> 16, 9000L) + 1000L}"
    val ver = VERSIONS((java.lang.Long.remainderUnsigned(h >>> 24, 3L)).toInt)
    val nWords = 20 + java.lang.Long.remainderUnsigned(h >>> 32, 30L).toInt
    val sb = new StringBuilder
    var k = 0
    var g = h
    while (k < nWords) {
      g = mix(g)
      if (k > 0) sb.append(' ')
      sb.append(WORDS(java.lang.Long.remainderUnsigned(g, WORDS.length.toLong).toInt))
      k += 1
    }
    val content = sb.toString
    val pk = s"${"%02d".format(state)}_${year}_${docid}_$ver"
    (pk, state, year, docid, ver, content.length.toLong, content)
  }
}

private[sources] class BillsGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "billsgen"
  override def schema(): StructType = BillsGen.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives table properties; reader options arrive here — merge
    // with reader options taking precedence.
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new BillsGenScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** ScanBuilder with column pruning + state/year filter pushdown + partial
  * aggregate pushdown (COUNT(*)/MIN/MAX on the generator-cheap columns). */
private[sources] class BillsGenScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var requiredSchema: StructType = BillsGen.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept simple numeric comparisons on the two generator-cheap columns;
    * everything else stays a post-scan Filter (returned as "to be evaluated
    * by Spark"). Accepted filters are FULLY consumed by the source — Spark
    * plans no residual Filter for them — so acceptance is deliberately
    * narrow: attribute ∈ {state, year} AND a numeric literal. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def ok(a: String, v: Any): Boolean =
      (a == "state" || a == "year") && v.isInstanceOf[Number]
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, v) => ok(a, v)
      case GreaterThan(a, v) => ok(a, v)
      case GreaterThanOrEqual(a, v) => ok(a, v)
      case LessThan(a, v) => ok(a, v)
      case LessThanOrEqual(a, v) => ok(a, v)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false): each
    * input partition emits one row of partial COUNT/MIN/MAX values and Spark
    * plans the final merge — the same split as a map-side-combined
    * HashAggregate, except the "map side" never materializes rows at all.
    * Accepts only group-free COUNT(*)/MIN/MAX over state/year; anything else
    * declines and Spark falls back to a plain scan + aggregate. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def cheapCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference =>
          nr.fieldNames.length == 1 &&
            (nr.fieldNames()(0) == "state" || nr.fieldNames()(0) == "year")
        case _ => false
      }
    val ok = agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => cheapCol(m.column)
        case m: Max => cheapCol(m.column)
        case _ => false
      }
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def build(): Scan = new BillsGenScan(
    rows = options.getLong("rows", 1000L),
    numPartitions = options.getInt("numPartitions", 8),
    seed = options.getLong("seed", 42L),
    requiredSchema = requiredSchema,
    pushed = pushed,
    pushedAgg = pushedAgg,
    rowsPerBatch = options.getLong("rowsPerBatch", 1000L))
}

private[sources] class BillsGenScan(
    rows: Long,
    numPartitions: Int,
    seed: Long,
    requiredSchema: StructType,
    pushed: Array[Filter],
    pushedAgg: Option[Aggregation] = None,
    rowsPerBatch: Long = 1000L) extends Scan with Batch {

  /** With a pushed aggregation, the scan's output schema is the partial-agg
    * row (one LongType per aggregate, positional), not the table columns. */
  private val aggSchema: Option[StructType] = pushedAgg.map { agg =>
    StructType(agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  }

  override def readSchema(): StructType = aggSchema.getOrElse(requiredSchema)
  override def toBatch: Batch = this
  override def description(): String =
    s"BillsGen rows=$rows PushedFilters=[${pushed.mkString(", ")}] " +
      pushedAgg.map(a =>
        s"PushedAggregates=[${a.aggregateExpressions.mkString(", ")}] ").getOrElse("") +
      s"ReadSchema=${readSchema().fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + numPartitions - 1) / numPartitions)
    (0L until rows by per)
      .map(lo => BillsGenPartition(lo, math.min(lo + per, rows)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    pushedAgg match {
      case Some(agg) =>
        // serialize what the executor needs as simple (kind, col) pairs —
        // AggregateFunc itself is not serializable-stable across versions
        val specs: Array[(String, String)] = agg.aggregateExpressions.map {
          case _: CountStar => ("count", "")
          case m: Min => ("min", m.column.asInstanceOf[NamedReference].fieldNames()(0))
          case m: Max => ("max", m.column.asInstanceOf[NamedReference].fieldNames()(0))
          case other => throw new IllegalStateException(s"unpushable agg $other")
        }
        new BillsGenAggReaderFactory(seed, pushed, specs)
      case None => new BillsGenReaderFactory(seed, requiredSchema, pushed)
    }

  /** The same deterministic row range as a MICRO-BATCH STREAM: offsets are
    * row indices, each batch generates [start, end) executor-side from
    * (seed, index) alone, so restart/replay from any checkpointed offset
    * regenerates identical rows — the exactly-once source contract for free.
    * Column pruning and state/year pushdown apply unchanged (aggregate
    * pushdown never reaches a streaming scan, so `pushedAgg` is batch-only). */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new BillsGenMicroBatchStream(rows, rowsPerBatch, numPartitions, seed,
      requiredSchema, pushed)
}

/** Row-index offset (json = the index itself). */
private[sources] case class BillsGenOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

/** Micro-batch view of the generator: admission-controlled (default
  * `rowsPerBatch` rows per trigger) and AvailableNow-aware (drains the
  * remaining range in admission-sized batches, then terminates). */
private[sources] class BillsGenMicroBatchStream(
    rows: Long,
    rowsPerBatch: Long,
    numPartitions: Int,
    seed: Long,
    requiredSchema: StructType,
    pushed: Array[Filter])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = BillsGenOffset(0L)
  override def deserializeOffset(json: String): Offset = BillsGenOffset(json.toLong)

  override def prepareForTriggerAvailableNow(): Unit = ()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset = BillsGenOffset(rows)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[BillsGenOffset].n
    val hi = limit match {
      case m: ReadMaxRows => math.min(rows, lo + m.maxRows())
      case _ => rows
    }
    BillsGenOffset(hi)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[BillsGenOffset].n
    val hi = end.asInstanceOf[BillsGenOffset].n
    if (hi <= lo) Array.empty
    else {
      val per = math.max(1L, (hi - lo + numPartitions - 1) / numPartitions)
      (lo until hi by per)
        .map(l => BillsGenPartition(l, math.min(l + per, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BillsGenReaderFactory(seed, requiredSchema, pushed)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class BillsGenPartition(lo: Long, hi: Long) extends InputPartition

private[sources] object FilterEval {
  private def lv(v: Any): Long = v.asInstanceOf[Number].longValue
  private def cv(a: String, state: Long, year: Long): Long =
    if (a == "state") state else year

  def passes(pushed: Array[Filter], state: Long, year: Long): Boolean =
    pushed.forall {
      case EqualTo(a, v) => cv(a, state, year) == lv(v)
      case GreaterThan(a, v) => cv(a, state, year) > lv(v)
      case GreaterThanOrEqual(a, v) => cv(a, state, year) >= lv(v)
      case LessThan(a, v) => cv(a, state, year) < lv(v)
      case LessThanOrEqual(a, v) => cv(a, state, year) <= lv(v)
      case _ => true
    }
}

/** Partial-aggregate reader: one output row per partition holding the
  * partition's COUNT/MIN/MAX values — no table rows are materialized. */
private[sources] class BillsGenAggReaderFactory(
    seed: Long,
    pushed: Array[Filter],
    specs: Array[(String, String)]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BillsGenPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = {
        if (emitted) return false
        var count = 0L
        val mins = Array.fill(specs.length)(Long.MaxValue)
        val maxs = Array.fill(specs.length)(Long.MinValue)
        var i = p.lo
        while (i < p.hi) {
          val (_, state, year, _, _, _, _) = BillsGen.row(i, seed)
          if (FilterEval.passes(pushed, state, year)) {
            count += 1
            var j = 0
            while (j < specs.length) {
              val v = if (specs(j)._2 == "state") state else year
              if (v < mins(j)) mins(j) = v
              if (v > maxs(j)) maxs(j) = v
              j += 1
            }
          }
          i += 1
        }
        emitted = true
        current = InternalRow.fromSeq(specs.zipWithIndex.map {
          case (("count", _), _) => count
          case (("min", _), j) => if (count == 0) null else mins(j)
          case (("max", _), j) => if (count == 0) null else maxs(j)
          case (other, _) => throw new IllegalStateException(s"bad spec $other")
        }.toSeq)
        true
      }
      private var current: InternalRow = _
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] class BillsGenReaderFactory(
    seed: Long,
    requiredSchema: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BillsGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.lo - 1
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (i + 1 < p.hi) {
          i += 1
          val (pk, state, year, docid, ver, len, content) = BillsGen.row(i, seed)
          if (FilterEval.passes(pushed, state, year)) {
            val vals: ArrayBuffer[Any] = ArrayBuffer.empty
            requiredSchema.fieldNames.foreach {
              case "primary_key" => vals += UTF8String.fromString(pk)
              case "state" => vals += state
              case "year" => vals += year
              case "docid" => vals += UTF8String.fromString(docid)
              case "docversion" => vals += UTF8String.fromString(ver)
              case "length" => vals += len
              case "content" => vals += UTF8String.fromString(content)
            }
            current = InternalRow.fromSeq(vals.toSeq)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
