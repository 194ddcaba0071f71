package graft.sources

import java.util

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal Avro container-file source/sink —
  * `spark.read.format("graft.sources.AvroLite").load(path)` and
  * [[AvroLite.write]].
  *
  * The reference ingests Avro bill files (SURVEY §2.1 S7, reference
  * README.md:11-31, dataformat/bills.avsc) through the spark-avro connector;
  * that connector jar is not in this environment, but the Apache Avro core
  * library is — so S7 is closed with a DSv2 source over
  * `org.apache.avro.file.DataFileReader` directly.
  *
  * Scale shape (same contract as every file source here): one
  * `InputPartition` per .avro container file, rows decoded executor-side;
  * column pruning reaches the reader (Avro is row-major, so pruning saves
  * record→InternalRow conversion, not raw IO — exactly what spark-avro
  * does). Supported Avro types: the flat-record subset the reference's
  * bills.avsc uses plus the testdata tables — BOOLEAN, INT, LONG, FLOAT,
  * DOUBLE, STRING, BYTES, and their `["null", T]` unions.
  */
class AvroLite extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroLite.listFiles(AvroLite.pathOf(options))
    // empty → empty schema: the WRITE path infers before any file exists and
    // then supplies the query schema via getTable (supportsExternalMetadata)
    if (files.isEmpty) StructType(Nil)
    else {
      val r = new DataFileReader[GenericRecord](
        files.head, new GenericDatumReader[GenericRecord]())
      try AvroLite.toStructType(r.getSchema) finally r.close()
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroLiteTable(schema, new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = true
}

object AvroLite {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "AvroLite requires .load(path)")
    p
  }

  private[sources] def listFiles(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    val all =
      if (f.isDirectory) f.listFiles().toSeq else Seq(f)
    // hidden ('.') and marker ('_') names are never data — in particular the
    // write path's uncommitted `.tmp-*.avro` attempt files
    all.filter(x => x.getName.endsWith(".avro") &&
        !x.getName.startsWith(".") && !x.getName.startsWith("_"))
      .sortBy(_.getName)
  }

  /** Avro record schema → Spark StructType (flat records; `["null", T]`
    * unions become nullable fields). */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(t), nullable)
    })
  }

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.toArray(Array.empty[Schema])
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"only [null, T] unions supported: $s")
      (nonNull.head, branches.length != nonNull.length)
    } else (s, false)

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  /** Spark StructType → flat Avro record schema (inverse of
    * [[toStructType]]; nullable fields become `["null", T]` unions). */
  def toAvroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = new util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      val sch = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      fields.add(new Schema.Field(f.name, sch, null, null))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Write a DataFrame as Avro container files, one `part-NNNNN.avro` per
    * partition, executor-side (`foreachPartition` over the executed plan's
    * InternalRows — no driver collect). Task-id-named files into a shared
    * directory is the standard committer layout; retry overwrite is
    * idempotent because the file name is a pure function of the partition
    * id. Local-filesystem paths here (the test environment); a cluster
    * deployment swaps the `java.io` calls for the Hadoop FileSystem API —
    * the partitioning and encode path are unchanged. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st).toString
    new java.io.File(path).mkdirs()
    df.queryExecution.toRdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path, f"part-$pid%05d.avro"))
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.length) {
            rec.put(i, if (row.isNullAt(i)) null else st.fields(i).dataType match {
              case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
              case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
              case LongType => java.lang.Long.valueOf(row.getLong(i))
              case FloatType => java.lang.Float.valueOf(row.getFloat(i))
              case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
              case StringType => row.getUTF8String(i).toString
              case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
              case other => throw new IllegalStateException(s"unsupported $other")
            })
            i += 1
          }
          w.append(rec)
        }
      } finally w.close()
    }
  }
}

private[sources] class AvroLiteTable(schema: StructType,
                                     options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"avrolite(${AvroLite.pathOf(options)})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new AvroLiteScanBuilder(schema, new CaseInsensitiveStringMap(merged))
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new AvroLiteWriteBuilder(AvroLite.pathOf(options), info.schema())
}

private[sources] class AvroLiteScanBuilder(full: StructType,
                                           options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new AvroLiteScan(AvroLite.pathOf(options), full, required,
      options.getInt("maxFilesPerTrigger", 0))
}

private[sources] class AvroLiteScan(path: String, full: StructType,
                                    required: StructType,
                                    maxFilesPerTrigger: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroLite path=$path ReadSchema=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    AvroLite.listFiles(path)
      .map(f => AvroFilePartition(f.getAbsolutePath): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroLiteReaderFactory(required)

  /** File-arrival MICRO-BATCH stream: the offset is the number of files
    * consumed from the name-sorted listing, so each trigger reads exactly
    * the newly landed files (one partition per file) and replay from a
    * checkpointed offset re-reads the identical file slice. Assumes the
    * directory is append-only with monotonically-sorting names — exactly
    * what the [[AvroLiteBatchWrite]] job-token naming produces; an external
    * producer must follow the same discipline (or use the batch source).
    * `maxFilesPerTrigger` bounds admission per micro-batch. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroLiteMicroBatchStream(path, required, maxFilesPerTrigger)
}

private[sources] final case class AvroFilePartition(file: String)
    extends InputPartition

private[sources] class AvroLiteReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroLiteReader(p.asInstanceOf[AvroFilePartition].file, required)
}

private[sources] class AvroLiteReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = new DataFileReader[GenericRecord](
    new java.io.File(file), new GenericDatumReader[GenericRecord]())
  // resolve required column name → avro field position once per partition
  private val positions: Array[Int] =
    required.fieldNames.map(reader.getSchema.getField(_).pos())
  private var rec: GenericRecord = _

  override def next(): Boolean = {
    if (!reader.hasNext) return false
    rec = reader.next(rec)
    true
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      vals(i) = convert(rec.get(positions(i)), required.fields(i).dataType)
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  private def convert(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case _ => v // boolean / int / long / float / double pass through
    }

  override def close(): Unit = reader.close()
}

private[sources] case class AvroFileOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

private[sources] class AvroLiteMicroBatchStream(path: String,
                                                required: StructType,
                                                maxFilesPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // AvailableNow pins the listing at prepare time so the drain terminates
  // even if files keep landing during it
  @volatile private var pinned: Option[Int] = None

  private def listing(): Seq[java.io.File] = AvroLite.listFiles(path)
  private def visibleCount(): Int =
    pinned.getOrElse(listing().size)

  override def initialOffset(): Offset = AvroFileOffset(0)
  override def deserializeOffset(json: String): Offset =
    AvroFileOffset(json.toInt)

  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(listing().size)
  override def reportLatestOffset(): Offset = AvroFileOffset(visibleCount())
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[AvroFileOffset].n
    val avail = visibleCount()
    val hi = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(avail, lo + m.maxFiles())
      case _ => avail
    }
    AvroFileOffset(math.max(lo, hi))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[AvroFileOffset].n
    val hi = end.asInstanceOf[AvroFileOffset].n
    listing().slice(lo, hi)
      .map(f => AvroFilePartition(f.getAbsolutePath): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroLiteReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** DSv2 WRITE path — `df.write.format("graft.sources.AvroLite")
  * .mode("append"|"overwrite").save(path)` — with the real two-phase commit
  * protocol the [[AvroLite.write]] helper hand-waves: each task writes a
  * uniquely-named temp file (task id in the name, so a speculative retry
  * never collides), task commit reports (temp, final) names, and only the
  * DRIVER's job commit renames winners into place (plus deletes the old
  * generation under truncate/overwrite) and drops a `_SUCCESS` marker.
  * An aborted task deletes its temp; an aborted job deletes all reported
  * temps — no torn output is ever visible to a reader. */
private[sources] class AvroLiteWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new AvroLiteBatchWrite(path, schema, doTruncate)
    }
}

private[sources] final case class AvroCommitMessage(tmp: String, fin: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class AvroLiteBatchWrite(path: String, schema: StructType,
                                          truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  // job-unique token in the FINAL file names so append jobs never rename
  // over a previous generation; retries within one job still converge on
  // one name per partition. Zero-padded and leading the name, so names
  // sort job-then-partition — later jobs' files always sort AFTER earlier
  // jobs', which the streaming offset scheme (consumed-file count over the
  // name-sorted list) depends on.
  private val job = f"${System.nanoTime()}%016x"

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new AvroLiteWriterFactory(path, AvroLite.toAvroSchema(schema).toString,
      schema, job)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    if (truncate)
      AvroLite.listFiles(path).foreach(_.delete())
    messages.foreach { case AvroCommitMessage(tmp, fin) =>
      val t = new java.io.File(tmp)
      if (!t.renameTo(new java.io.File(dir, fin)))
        throw new java.io.IOException(s"commit rename failed: $tmp -> $fin")
    }
    java.nio.file.Files.write(dir.toPath.resolve("_SUCCESS"), Array.empty[Byte])
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach {
      case AvroCommitMessage(tmp, _) => new java.io.File(tmp).delete()
      case _ =>
    }
}

private[sources] class AvroLiteWriterFactory(path: String, avroJson: String,
                                             schema: StructType, job: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new AvroLiteDataWriter(path, avroJson, schema, partitionId, taskId, job)
}

private[sources] class AvroLiteDataWriter(path: String, avroJson: String,
                                          st: StructType,
                                          partitionId: Int, taskId: Long,
                                          job: String)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val schema = new Schema.Parser().parse(avroJson)
  private val tmp = {
    new java.io.File(path).mkdirs()
    new java.io.File(path, f".tmp-part-$partitionId%05d-task-$taskId.avro")
  }
  private val w = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](schema))
  w.create(schema, tmp)

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.length) {
      rec.put(i, if (row.isNullAt(i)) null else st.fields(i).dataType match {
        case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
        case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
        case LongType => java.lang.Long.valueOf(row.getLong(i))
        case FloatType => java.lang.Float.valueOf(row.getFloat(i))
        case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
        case StringType => row.getUTF8String(i).toString
        case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
        case other => throw new IllegalStateException(s"unsupported $other")
      })
      i += 1
    }
    w.append(rec)
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    w.close()
    AvroCommitMessage(tmp.getAbsolutePath, f"part-$job-$partitionId%05d.avro")
  }

  override def abort(): Unit = { w.close(); tmp.delete() }
  override def close(): Unit = ()
}
