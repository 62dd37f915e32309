package graft.sources

import java.util
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => sstreaming}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 connector for WARC files: `spark.read.format("warc")
 * .load(path)` — one row per WARC record, one input partition per file
 * (the upstream crawl's ~1 GB segmentation is the parallelism unit, the
 * same contract as [[Warc.readWarc]]'s binaryFile route).
 *
 * Being a first-class connector buys what the binaryFile route can't:
 * COLUMN PRUNING reaches the reader — `select(target_uri)` never
 * materializes body byte arrays into rows (the scan's readSchema is
 * pushed down and only requested fields are built), which at crawl
 * scale is most of the data volume. Record splitting itself reuses
 * [[WarcRecords.parseOne]], so the two routes can never disagree.
 */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.get("path"))
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("warc_profile", StringType, nullable = true),
    StructField("refers_to", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("segment_number", LongType, nullable = true),
    StructField("segment_origin_id", StringType, nullable = true),
    StructField("segment_total_length", LongType, nullable = true)))

  /** The ACTIVE session's Hadoop configuration (object-store
    * credentials, endpoints, defaultFS live there — a bare
    * `new Configuration()` would make s3a/abfs paths fail even though
    * parquet reads on the same session work), flattened to entries so
    * it can ride to executors inside plain-serializable scan objects. */
  private[sources] def sessionHadoopConfEntries(): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
  }

  private[sources] def confFrom(entries: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private[sources] def listFiles(path: String,
      confEntries: Array[(String, String)]): Seq[String] = {
    require(path != null && path.nonEmpty, "warc source requires a path")
    val p = new Path(path)
    val fs = p.getFileSystem(confFrom(confEntries))
    val matched: Array[FileStatus] = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val expanded = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }
    expanded.map(_.getPath.toString).sorted.toSeq
  }
}

private class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path)
}

private class WarcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WarcScan(path, required)
}

private class WarcScan(path: String, required: StructType) extends Scan with Batch {
  // captured at scan build (driver, active session) and shipped to tasks
  private val confEntries = WarcDataSource.sessionHadoopConfEntries()
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc $path [${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.listFiles(path, confEntries)
      .map(f => WarcFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, confEntries)
  override def toMicroBatchStream(checkpointLocation: String): sstreaming.MicroBatchStream =
    new WarcMicroBatchStream(path, required, confEntries)
}

/** Streaming WARC ingestion: the offset is a position in the
  * name-sorted segment list, so each micro-batch reads the files that
  * appeared since the last one — the crawl-drop ingestion shape
  * (upstream crawls name segments monotonically, which is the
  * documented contract; a file sorting BEFORE the committed offset is
  * never re-read). Restart replays nothing: offsets live in the query
  * checkpoint. */
private class WarcMicroBatchStream(path: String, required: StructType,
    confEntries: Array[(String, String)])
    extends sstreaming.MicroBatchStream
    with sstreaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class Pos(n: Int) extends Offset {
    override def json(): String = n.toString
  }

  // Trigger.AvailableNow contract: pin the target offset ONCE at query
  // start so the run drains exactly the segments present then, even if
  // more land mid-run
  @volatile private var availableNowTarget: Int = -1
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = WarcDataSource.listFiles(path, confEntries).size

  private def currentLatest: Offset =
    Pos(if (availableNowTarget >= 0) availableNowTarget
      else WarcDataSource.listFiles(path, confEntries).size)

  override def initialOffset(): Offset = Pos(0)
  override def latestOffset(): Offset = currentLatest
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = currentLatest
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = Pos(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[Pos].n
    val e = end.asInstanceOf[Pos].n
    WarcDataSource.listFiles(path, confEntries).slice(s, e)
      .map(f => WarcFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, confEntries)
}

private case class WarcFilePartition(file: String) extends InputPartition

private class WarcReaderFactory(required: StructType,
    confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcFilePartition].file, required, confEntries)
}

/** Reads one WARC file: whole-blob load (the same memory contract as
  * Spark's binaryFile source), transparent multi-member gunzip, then
  * record-at-a-time iteration building ONLY the pruned columns. */
private class WarcPartitionReader(file: String, required: StructType,
    confEntries: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  // full-schema field order: path, warc_type, target_uri, warc_date,
  // http_status, content_type, body
  private val proj: Array[Int] =
    required.fieldNames.map(WarcDataSource.schema.fieldIndex)

  private val bytes: Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(WarcDataSource.confFrom(confEntries))
    val in = fs.open(p)
    val raw =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    // the inflate step is the KERNEL's (the two routes must not diverge)
    val un = WarcRecords.inflateIfGzip(raw)
    if (un == null) Array.emptyByteArray else un
  }

  private val pathUtf8 = UTF8String.fromString(file)
  private var pos = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
    if (pos >= bytes.length) return false
    WarcRecords.parseOne(bytes, pos) match {
      case Some((full, nxt)) =>
        pos = nxt
        val vals = new Array[Any](proj.length)
        var i = 0
        while (i < proj.length) {
          vals(i) = if (proj(i) == 0) pathUtf8 else full.get(proj(i) - 1,
            WarcDataSource.schema.fields(proj(i)).dataType)
          i += 1
        }
        current = InternalRow.fromSeq(vals.toIndexedSeq)
        true
      case None => false // truncated tail: keep the valid prefix
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
