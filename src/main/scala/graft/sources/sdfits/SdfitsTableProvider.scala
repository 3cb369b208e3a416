package graft.sources.sdfits

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import SdfitsFormat._

/** Read-only DataSource V2 over the reference's two-part SDFITS file model
  * (S1 as the reference actually does it — `fits.open` → header + BINTABLE,
  * validate.py:18-23): `spark.read.format("sdfits").load(path)` where
  * `path` is one file or a directory of `*.fits`.
  *
  * Scale shape: one [[InputPartition]] per FILE — an SDFITS observation is a
  * single sequential time series (row order is load-bearing, SURVEY §1.1),
  * so a file is the natural parallelism unit, exactly like the engine's
  * per-file `mapGroups` operators. Column pruning is pushed into the reader
  * ([[SupportsPushDownRequiredColumns]]): unprojected columns are never
  * decoded (the wide DATA vector skipped for flag-only scans). Every file
  * is structurally verified on open (S2) and checked against the inferred
  * schema (U1 strict-merge semantics: a drifting file fails loudly rather
  * than silently nulling).
  */
class SdfitsTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "sdfits"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = SdfitsTableProvider.driverConf()
    // A missing or fileless path is legal for the WRITE side (the table
    // schema then comes from the query via ACCEPT_ANY_SCHEMA); READS of
    // either still fail in planInputPartitions ("no input files").
    val files =
      try SdfitsTableProvider.listFiles(SdfitsTableProvider.pathOf(options), conf)
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    if (files.isEmpty) return new StructType()
    val bytes = SdfitsTableProvider.readFully(files.head, conf)
    val (_, table) = SdfitsFormat.open(bytes)
    SdfitsTableProvider.toStructType(table.cols)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SdfitsTable(schema,
      SdfitsTableProvider.pathOf(new CaseInsensitiveStringMap(properties)))
}

object SdfitsTableProvider {

  private[sdfits] def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sdfits: 'path' option is required"))

  /** Session Hadoop configuration when a session is active (fs credentials,
    * defaultFS, custom schemes — a bare `new Configuration()` would ignore
    * them and break any configured filesystem), defaults otherwise.
    */
  private[sdfits] def driverConf(): Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private[sdfits] def listFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).sorted
    else Seq(p.toString)
  }

  private[sdfits] def readFully(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"sdfits: $path larger than 2 GiB")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  private[sdfits] def toStructType(cols: Seq[ColSpec]): StructType =
    StructType(cols.map { c =>
      val dt = c.code match {
        case 'D' if c.repeat == 1 => DoubleType
        case 'E' if c.repeat == 1 => FloatType
        case 'J' => IntegerType
        case 'K' => LongType
        case 'A' => StringType
        case 'D' => ArrayType(DoubleType, containsNull = false)
        case 'E' => ArrayType(FloatType, containsNull = false)
        case other =>
          throw new SdfitsVerificationException(s"unsupported TFORM code '$other'")
      }
      StructField(c.name, dt, nullable = false)
    })
}

private[sdfits] class SdfitsTable(schema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"sdfits:$path"
  override def schema(): StructType = schema
  // ACCEPT_ANY_SCHEMA: on a fresh (empty) write path the table has no
  // schema to validate against — the write schema is the query's.
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SdfitsScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SdfitsWriteBuilder(info, path)
}

private[sdfits] class SdfitsScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SdfitsScan(full, required, path)
}

private[sdfits] case class SdfitsInputPartition(file: String) extends InputPartition

private[sdfits] class SdfitsScan(full: StructType, required: StructType, path: String)
    extends Scan with Batch {
  // Resolved on the driver (session fs settings apply) and shipped to the
  // reader tasks via the factory — executors must see the same filesystem
  // configuration the planner listed files with.
  private val conf = new SerializableWritable(SdfitsTableProvider.driverConf())
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val files = SdfitsTableProvider.listFiles(path, conf.value)
    // An existing-but-fileless directory must fail on READ like a missing
    // one — a zero-column empty frame would silently hide a bad path.
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(s"sdfits: no input files at $path")
    files.map(SdfitsInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SdfitsReaderFactory(full, required, conf)
}

private[sdfits] class SdfitsReaderFactory(
    full: StructType, required: StructType,
    conf: SerializableWritable[Configuration])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SdfitsPartitionReader(partition.asInstanceOf[SdfitsInputPartition].file,
      full, required, conf.value)
}

private[sdfits] class SdfitsPartitionReader(
    file: String, full: StructType, required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val bytes = SdfitsTableProvider.readFully(file, conf)
  private val table: TableSpec = {
    val (_, t) = SdfitsFormat.open(bytes)
    val actual = SdfitsTableProvider.toStructType(t.cols)
    if (actual != full)
      throw new SdfitsVerificationException(
        s"$file: schema ${actual.simpleString} does not match the table's ${full.simpleString}")
    t
  }
  // (column spec, byte offset within row) per projected field — unprojected
  // columns are never decoded
  private val projected: Array[(ColSpec, Int)] = {
    val offsets = table.cols.scanLeft(0)(_ + _.bytes)
    required.fields.map { f =>
      val i = table.cols.indexWhere(_.name == f.name)
      (table.cols(i), offsets(i))
    }
  }
  private var row = -1

  override def next(): Boolean = { row += 1; row < table.nRows }

  override def get(): InternalRow = {
    val vals = new Array[Any](projected.length)
    var i = 0
    while (i < projected.length) {
      val (c, off) = projected(i)
      vals(i) = SdfitsFormat.decodeCell(bytes, table, row, c, off) match {
        case s: String          => UTF8String.fromString(s)
        case a: Array[Double]   => new GenericArrayData(a)
        case a: Array[Float]    => new GenericArrayData(a)
        case other              => other
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}
