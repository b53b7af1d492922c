package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The GraftAcid CHANGE DATA FEED as a DataSource V2
  * `MicroBatchStream` (r19 verdict ask #3): `tailChanges` is
  * foreachBatch-shaped — a terminal sink — so downstream SQL could not
  * SUBSCRIBE to the feed. This source exposes it as a first-class
  * streaming DataFrame:
  *
  * {{{
  *   spark.readStream.format("graft-cdf").option("root", root).load()
  *     // => (key, pre, post, change_type, commit_version) rows
  * }}}
  *
  * OFFSETS ARE VERSIONS: the manifest log is the stream — `initial`
  * is the retention floor − 1, `latest` is [[GraftAcid.latestVersion]]
  * (the O(1) pointer-probe read), and batch (start, end] delivers the
  * change rows of exactly those commits. The engine checkpoints the
  * offset, so a restart resumes at the first un-seen commit with no
  * duplicate and no loss (Round20Spec pins it) — the same contract as
  * the file-source tail, now composable under watermarks, windows,
  * joins, and SQL.
  *
  * PER-COMMIT CHANGE MATERIALIZATION: planning a batch materializes
  * each new commit's change rows ONCE under `<root>/_cdc/v=<v>/` —
  * the distributed [[GraftAcid.commitChanges]] diff job (cost = what
  * the commit changed, never a table scan), landed via
  * write-temp-then-atomic-rename so concurrent subscribers and
  * failed-batch retries converge on one complete copy (`_SUCCESS`
  * gates reuse). This is Delta's `_change_data` shape with the files
  * derived lazily instead of at commit time: the first subscriber
  * pays the diff, every later one reads the cache. Readers then parse
  * the materialized files directly inside executor `PartitionReader`s
  * — one partition per file, no driver-side row movement ever.
  * (The cache codec is JSON-lines for a dependency-free reader; a
  * parquet cache would drop in behind the same seam.)
  *
  * Scale shape: per trigger the driver does file-count-sized metadata
  * work (pointer probe + one listing per NEW commit), one Spark diff
  * job per new commit, and ships file paths; executors stream the
  * change files. At 100 TB the feed costs what the commits changed. */
class GraftCdf extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdf.cdfSchema(GraftCdf.rootOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftCdfTable(
      GraftCdf.rootOf(new CaseInsensitiveStringMap(properties)), schema)
}

object GraftCdf {
  private[sources] def rootOf(options: CaseInsensitiveStringMap): String = {
    val r = options.get("root")
    require(r != null && r.nonEmpty, "graft-cdf requires option 'root'")
    r
  }

  /** Change-row schema of the table at `root`: the key column with its
    * table type, pre/post images over every non-key column, the change
    * class, and the commit version (the stream's event-order column —
    * queries derive event time from it). Leaf types are validated
    * eagerly so an unsupported column fails at stream DEFINITION, not
    * inside an executor. */
  private[sources] def cdfSchema(root: String): StructType = {
    val m = GraftAcid.readManifest(root, GraftAcid.latestVersion(root))
    val tbl = StructType.fromDDL(m.schemaDdl)
    val img = StructType(tbl.fields.filter(_.name != m.key))
    val key = tbl.fields.find(_.name == m.key).getOrElse(
      throw new IllegalStateException(s"key ${m.key} missing from schema"))
    val out = StructType(Seq(key,
      StructField("pre", img), StructField("post", img),
      StructField("change_type", StringType),
      StructField("commit_version", LongType)))
    def check(dt: DataType): Unit = dt match {
      case _: StructType => dt.asInstanceOf[StructType].fields.foreach(f => check(f.dataType))
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | BooleanType | StringType => ()
      case other => throw new UnsupportedOperationException(
        s"graft-cdf change-file reader does not support ${other.simpleString}")
    }
    check(out)
    out
  }

  /** Materialize commit `v`'s change rows under `<root>/_cdc/v=<v>/`
    * (idempotent; `_SUCCESS`-gated reuse; atomic-rename publication so
    * a concurrent materializer or a crashed attempt never exposes a
    * partial directory). Returns the part files to read. */
  private[sources] def materialize(s: SparkSession, root: String, v: Int): Seq[String] = {
    val dir = java.nio.file.Paths.get(root, "_cdc", s"v=$v")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
      val tmp = java.nio.file.Paths.get(root, "_cdc",
        s".tmp_v${v}_${java.util.UUID.randomUUID().toString.take(8)}")
      GraftAcid.commitChanges(s, root, v)
        .withColumn("commit_version", lit(v.toLong))
        .write.option("ignoreNullFields", "false").json(tmp.toString)
      try java.nio.file.Files.move(tmp, dir,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // a concurrent materializer won the rename — use its copy
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
    }
    val ls = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.toString)
        .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("part-"))
        .toSeq.sorted
    } finally ls.close()
  }
}

private[sources] class GraftCdfTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_cdf(`$root`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdfStream(root, tableSchema)
      }
    }
}

private[sources] case class CdfOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

private[sources] case class CdfInputPartition(path: String) extends InputPartition

/** Offsets = committed versions. Implements Trigger.AvailableNow
  * natively: `prepareForTriggerAvailableNow` pins the end offset, so
  * the run drains exactly the commits present at start and stops. */
private[sources] class GraftCdfStream(root: String, schema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // the stream object lives on the driver; the session is captured at
  // query start for the per-commit materialization jobs
  @transient private val session = SparkSession.active
  @volatile private var availableNowEnd: Option[Int] = None

  private def currentLatest(): Int = GraftAcid.latestVersion(root)

  override def initialOffset(): Offset = {
    val floor = GraftAcid.earliestVersion(root)
    require(floor >= 0, s"no commits at $root")
    CdfOffset(floor - 1)
  }
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(currentLatest())
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset =
    CdfOffset(availableNowEnd.getOrElse(currentLatest()))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def reportLatestOffset(): Offset = CdfOffset(currentLatest())
  override def deserializeOffset(json: String): Offset =
    CdfOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[CdfOffset].version
    val s1 = end.asInstanceOf[CdfOffset].version
    ((s0 + 1) to s1).flatMap { v =>
      GraftCdf.materialize(session, root, v).map(CdfInputPartition(_))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdfReaderFactory(schema)
}

/** Executor-side JSON-lines → InternalRow decode of one change file.
  * The conversion is schema-driven and recursive over the (validated)
  * primitive + struct types; a missing or null field reads as null. */
private[sources] class CdfReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[CdfInputPartition].path
    new PartitionReader[InternalRow] {
      private val reader = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
      private val om = new com.fasterxml.jackson.databind.ObjectMapper()
      private var row: InternalRow = _

      private def toRow(node: com.fasterxml.jackson.databind.JsonNode,
          st: StructType): InternalRow =
        InternalRow.fromSeq(st.fields.toIndexedSeq.map { f =>
          val n = node.get(f.name)
          if (n == null || n.isNull) null
          else f.dataType match {
            case LongType => java.lang.Long.valueOf(n.asLong())
            case IntegerType => java.lang.Integer.valueOf(n.asInt())
            case ShortType => java.lang.Short.valueOf(n.asInt().toShort)
            case ByteType => java.lang.Byte.valueOf(n.asInt().toByte)
            case DoubleType => java.lang.Double.valueOf(n.asDouble())
            case FloatType => java.lang.Float.valueOf(n.asDouble().toFloat)
            case BooleanType => java.lang.Boolean.valueOf(n.asBoolean())
            case StringType => UTF8String.fromString(n.asText())
            case nested: StructType => toRow(n, nested)
            case other => throw new UnsupportedOperationException(
              s"unsupported ${other.simpleString}") // cdfSchema pre-validates
          }
        })

      override def next(): Boolean = {
        val line = reader.readLine()
        if (line == null) false
        else { row = toRow(om.readTree(line), schema); true }
      }
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}
