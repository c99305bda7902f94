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
  * 100 TB. Column pruning is pushed INTO the scan
  * (SupportsPushDownRequiredColumns): the reader emits only the
  * requested fields, and when none of the fidelity fields are needed it
  * parses through [[CifParser.parseAtomSiteLean]] — an analysis query
  * `select(chain, x, y, z)` never pays the 19-field extraction.
  * Predicate pushdown is not needed — the gate filter happens on the
  * summary JSON table before any CIF is opened.
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

  private[sources] val fullGetters: Map[String, graft.af3.CifAtom => Any] = Map(
    "job_dir" -> (a => UTF8String.fromString(a.job_dir)),
    "model_idx" -> (_.model_idx),
    "chain" -> (a => UTF8String.fromString(a.chain)),
    "res_id" -> (_.res_id),
    "res_name" -> (a => UTF8String.fromString(a.res_name)),
    "atom_name" -> (a => UTF8String.fromString(a.atom_name)),
    "x" -> (_.x), "y" -> (_.y), "z" -> (_.z),
    "ordinal" -> (_.ordinal),
    "group_pdb" -> (a => UTF8String.fromString(a.group_pdb)),
    "type_symbol" -> (a => UTF8String.fromString(a.type_symbol)),
    "alt_id" -> (a => UTF8String.fromString(a.alt_id)),
    "label_asym_id" -> (a => UTF8String.fromString(a.label_asym_id)),
    "entity_id" -> (a => UTF8String.fromString(a.entity_id)),
    "label_seq_id" -> (a => UTF8String.fromString(a.label_seq_id)),
    "ins_code" -> (a => UTF8String.fromString(a.ins_code)),
    "occupancy" -> (a => a.occupancy.map(Double.box).orNull),
    "b_iso" -> (a => a.b_iso.map(Double.box).orNull))

  private[sources] val leanGetters: Map[String, graft.af3.CifAtomLean => Any] = Map(
    "job_dir" -> (a => UTF8String.fromString(a.job_dir)),
    "model_idx" -> (_.model_idx),
    "chain" -> (a => UTF8String.fromString(a.chain)),
    "res_id" -> (_.res_id),
    "res_name" -> (a => UTF8String.fromString(a.res_name)),
    "atom_name" -> (a => UTF8String.fromString(a.atom_name)),
    "x" -> (_.x), "y" -> (_.y), "z" -> (_.z))

  /** Fields available from the lean parse — a pruned schema inside this
    * set skips the fidelity-field extraction entirely. Derived from
    * leanGetters so the routing predicate and the row builder can't
    * drift (a routed-lean field with no getter would be a runtime
    * NoSuchElementException per partition).
    */
  private[sources] val leanFields: Set[String] = leanGetters.keySet
}

class CifTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"cif:$root"
  override def schema(): StructType = CifDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CifScanBuilder(root)
}

/** Column pruning lands here: Catalyst hands the builder the required
  * subset, and the scan's readers emit exactly those fields.
  */
class CifScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = CifDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new CifScan(root, required)
}

class CifScan(root: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
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
    new CifReaderFactory(props, required)
  }
}

case class CifFilePartition(path: String) extends InputPartition

class CifReaderFactory(confProps: Map[String, String], required: StructType)
    extends PartitionReaderFactory {
  private def rebuildConf(): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CifFilePartition].path
    new PartitionReader[InternalRow] {
      // the reference's 3-attempt read retry for transient IO
      // (read_cif_file, py:36-64); encoding fallback is inside decodeText
      private def readBytes(attempt: Int): Array[Byte] = {
        val hp = new Path(p)
        val fs = hp.getFileSystem(rebuildConf())
        try {
          val in = fs.open(hp)
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        } catch {
          case _: java.io.IOException if attempt < 3 =>
            Thread.sleep(50L * attempt)
            readBytes(attempt + 1)
        }
      }

      // pruned-to-lean scans skip the fidelity-field extraction; either
      // way each row materializes only the `required` columns, in order
      private val leanOnly =
        required.fieldNames.forall(CifDataSource.leanFields.contains)
      // one getter-array allocation per scan, one Array[Any] per row
      // (GenericInternalRow takes ownership — no per-atom intermediate
      // copies in the hot loop)
      private def buildRows[A](
          atoms: Iterator[A], getters: Array[A => Any]): Iterator[InternalRow] =
        atoms.map { a =>
          val arr = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) { arr(i) = getters(i)(a); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
        }
      private val rows: Iterator[InternalRow] = p match {
        case CifDataSource.pathRe(job, m) =>
          val text = CifParser.decodeText(readBytes(1))
          if (leanOnly)
            buildRows(CifParser.parseAtomSiteLean(job, m.toInt, text),
              required.fieldNames.map(CifDataSource.leanGetters))
          else
            buildRows(CifParser.parseAtomSite(job, m.toInt, text),
              required.fieldNames.map(CifDataSource.fullGetters))
        case _ => Iterator.empty
      }
      private var current: InternalRow = _

      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false

      override def get(): InternalRow = current

      override def close(): Unit = ()
    }
  }
}
