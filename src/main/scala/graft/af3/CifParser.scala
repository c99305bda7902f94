package graft.af3

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed `_atom_site` row (the fields the reference consumes via
  * BioPython: chain = auth_asym_id, res_id = auth_seq_id -> residue.id[1],
  * res_name -> residue.resname, atom coords -> atom.coord; cite
  * process_af3_outputs.py:146, 156-174, 227-251).
  */
final case class CifAtom(
    job_dir: String,
    model_idx: Int,
    chain: String,
    res_id: Int,
    res_name: String,
    atom_name: String,
    x: Double,
    y: Double,
    z: Double)

/** mmCIF `_atom_site` reader, Spark-native.
  *
  * Shape: `binaryFile` scan (one row per .cif, so the unit of parallelism
  * is the file — at 100 TB the bundles are many small independent files,
  * which is exactly the partitioning Spark's file scan gives us) followed
  * by a typed `flatMap` running a single-pass tokenizer. No Python/BioPython
  * dependency, no driver-side work; the parse runs inside executors and
  * feeds straight into columnar DataFrames.
  *
  * Limitations (fine for AF3 output bundles): values containing whitespace
  * inside quotes are not un-quoted; multi-model files take the row's
  * `pdbx_PDB_model_num` only through the filename convention
  * `*_model_{k}.cif` (the reference does the same, py:349, 440-441).
  */
object CifParser {

  /** Parse the `_atom_site` loop of one mmCIF text. Tolerant of field
    * order: positions come from the `_atom_site.*` header lines.
    */
  def parseAtomSite(jobDir: String, modelIdx: Int, text: String): Iterator[CifAtom] = {
    val lines = text.linesIterator
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var inHeader = false
    var inData = false
    val out = scala.collection.mutable.ArrayBuffer.empty[CifAtom]

    def idx(names: String*): Int =
      names.map(fields.indexOf).find(_ >= 0).getOrElse(-1)

    var iGrp, iChain, iRes, iResName, iAtom, iX, iY, iZ = -1

    def bindIndices(): Unit = {
      iGrp = idx("group_PDB")
      iChain = idx("auth_asym_id", "label_asym_id")
      iRes = idx("auth_seq_id", "label_seq_id")
      iResName = idx("auth_comp_id", "label_comp_id")
      iAtom = idx("label_atom_id", "auth_atom_id")
      iX = idx("Cartn_x"); iY = idx("Cartn_y"); iZ = idx("Cartn_z")
    }

    def emit(l: String): Unit = {
      val t = l.split("\\s+")
      // a row is usable only if the coordinate fields exist and the line
      // is long enough for every bound index — truncated rows and loops
      // missing Cartn_* are skipped, never fatal (≙ the reference's
      // per-file error tolerance, py:40-64)
      val maxIdx = Seq(iGrp, iChain, iRes, iResName, iAtom, iX, iY, iZ).max
      if (iGrp >= 0 && iX >= 0 && iY >= 0 && iZ >= 0 && t.length > maxIdx &&
          (t(iGrp) == "ATOM" || t(iGrp) == "HETATM")) {
        try {
          out += CifAtom(
            jobDir, modelIdx,
            if (iChain >= 0) t(iChain) else "",
            if (iRes >= 0) t(iRes).toInt else -1,
            if (iResName >= 0) t(iResName) else "",
            if (iAtom >= 0) t(iAtom) else "",
            t(iX).toDouble, t(iY).toDouble, t(iZ).toDouble)
        } catch { case _: NumberFormatException => () } // malformed row: skip
      }
    }

    val isTerminator = (line: String) =>
      line.isEmpty || line.startsWith("#") || line.startsWith("_") ||
        line.startsWith("loop_") || line.startsWith("data_")

    for (raw <- lines) {
      val line = raw.trim
      if (inHeader) {
        if (line.startsWith("_atom_site.")) {
          fields += line.stripPrefix("_atom_site.").trim
        } else if (fields.nonEmpty) {
          inHeader = false; bindIndices()
          // this line is the first data row (or a terminator)
          if (!isTerminator(line)) { inData = true; emit(line) }
        } else if (!line.startsWith("_")) {
          inHeader = false // a loop_ over some other category
        }
      } else if (inData) {
        if (isTerminator(line)) inData = false
        else emit(line)
      } else if (line == "loop_") {
        fields.clear(); inHeader = true
      }
    }
    out.iterator
  }

  private val pathRe = ".*/([^/]+)/[^/]+_model_(\\d+)\\.cif$".r

  /** Read all `*_model_*.cif` under `inputDir` (recursive) into a typed
    * atoms Dataset. `job_dir` = name of the containing folder, `model_idx`
    * from the filename (py:348-349, 440-441).
    */
  def readAtoms(spark: SparkSession, inputDir: String): Dataset[CifAtom] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.cif")
      .load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        path match {
          case pathRe(job, m) =>
            parseAtomSite(job, m.toInt, new String(content, java.nio.charset.StandardCharsets.UTF_8))
          case _ => Iterator.empty
        }
      }
  }

  def readAtomsDf(spark: SparkSession, inputDir: String): DataFrame =
    readAtoms(spark, inputDir).toDF()
}
