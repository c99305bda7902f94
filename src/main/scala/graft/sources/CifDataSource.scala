package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.af3.CifParser

/** DataSource V2 `cif` format — the polished form of the mmCIF reader
  * (SURVEY §2.1 scan_cif_atoms): one InputPartition per .cif file, the
  * same `_atom_site` tokenizer as [[graft.af3.CifParser]], a fixed typed
  * schema.
  *
  * Usage: `spark.read.format("graft.sources.cif").load(dir)` (or the
  * short name "cif" with the provider on the classpath via
  * META-INF/services).
  *
  * Scale shape: file listing happens once on the driver (cheap, names
  * only); each executor task opens and tokenizes exactly one bundle file,
  * so parallelism == number of files, which is how AF3 dumps arrive at
  * 100 TB. Column pruning is handled by Spark above the scan (rows are
  * narrow); predicate pushdown is not needed — the gate filter happens on
  * the summary JSON table before any CIF is opened.
  */
class CifDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "cif"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CifDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CifTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object CifDataSource {
  val schema: StructType = StructType(Seq(
    StructField("job_dir", StringType),
    StructField("model_idx", IntegerType),
    StructField("chain", StringType),
    StructField("res_id", IntegerType),
    StructField("res_name", StringType),
    StructField("atom_name", StringType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("z", DoubleType),
    StructField("ordinal", IntegerType),
    StructField("group_pdb", StringType),
    StructField("type_symbol", StringType),
    StructField("alt_id", StringType),
    StructField("label_asym_id", StringType),
    StructField("entity_id", StringType),
    StructField("label_seq_id", StringType),
    StructField("ins_code", StringType),
    StructField("occupancy", DoubleType),
    StructField("b_iso", DoubleType)))

  private[sources] val pathRe = ".*/([^/]+)/[^/]+_model_(\\d+)\\.cif$".r
}

class CifTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"cif:$root"
  override def schema(): StructType = CifDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CifScan(root)
}

class CifScan(root: String) extends Scan with Batch {
  override def readSchema(): StructType = CifDataSource.schema
  override def toBatch: Batch = this

  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(root).getFileSystem(hadoopConf)
    val it = fs.listFiles(new Path(root), true)
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (p.endsWith(".cif") && !f.getPath.getName.startsWith("._"))
        parts += CifFilePartition(p)
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session's Hadoop settings (fs credentials, custom
    // schemes) to executors — a fresh Configuration() there would drop
    // every spark.hadoop.* setting
    val props = {
      val c = hadoopConf
      val b = Map.newBuilder[String, String]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    new CifReaderFactory(props)
  }
}

case class CifFilePartition(path: String) extends InputPartition

class CifReaderFactory(confProps: Map[String, String]) extends PartitionReaderFactory {
  private def rebuildConf(): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CifFilePartition].path
    new PartitionReader[InternalRow] {
      private val atoms: Iterator[graft.af3.CifAtom] = p match {
        case CifDataSource.pathRe(job, m) =>
          // the reference's 3-attempt read retry for transient IO
          // (read_cif_file, py:36-64); encoding fallback is inside
          // decodeText
          def readBytes(attempt: Int): Array[Byte] = {
            val hp = new Path(p)
            val fs = hp.getFileSystem(rebuildConf())
            try {
              val in = fs.open(hp)
              try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
              finally in.close()
            } catch {
              case e: java.io.IOException if attempt < 3 =>
                Thread.sleep(50L * attempt)
                readBytes(attempt + 1)
            }
          }
          CifParser.parseAtomSite(job, m.toInt, CifParser.decodeText(readBytes(1)))
        case _ => Iterator.empty
      }
      private var current: graft.af3.CifAtom = _

      override def next(): Boolean =
        if (atoms.hasNext) { current = atoms.next(); true } else false

      override def get(): InternalRow =
        InternalRow(
          UTF8String.fromString(current.job_dir), current.model_idx,
          UTF8String.fromString(current.chain), current.res_id,
          UTF8String.fromString(current.res_name),
          UTF8String.fromString(current.atom_name),
          current.x, current.y, current.z,
          current.ordinal,
          UTF8String.fromString(current.group_pdb),
          UTF8String.fromString(current.type_symbol),
          UTF8String.fromString(current.alt_id),
          UTF8String.fromString(current.label_asym_id),
          UTF8String.fromString(current.entity_id),
          UTF8String.fromString(current.label_seq_id),
          UTF8String.fromString(current.ins_code),
          current.occupancy.map(Double.box).orNull,
          current.b_iso.map(Double.box).orNull)

      override def close(): Unit = ()
    }
  }
}
