package graft.af3

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** mmCIF rendering + distributed per-key text file sink.
  *
  * The reference writes one file per job via BioPython's MMCIFIO
  * (py:338-345, 423-427) and one `.pml` per job (py:533-535). Spark's
  * native writers produce one *directory* per partition; AF3 consumers
  * expect single named files, so the sink repartitions by file key and has
  * each executor task stream its keys' rows to exact paths — distributed,
  * no driver collect, deterministic order via an explicit sort. All file
  * IO goes through the Hadoop FileSystem API with the session's
  * configuration shipped to executors, so the sink works on any cluster
  * filesystem (HDFS/S3/local), not only a driver-shared local disk.
  */
object CifWriter {

  /** Quote a CIF token the way mmCIF requires when it carries a quote or
    * whitespace (nucleic-acid atom names like C1' -> "C1'"); plain tokens
    * pass through. Mirrors BioPython MMCIFIO's quoting on write.
    */
  private def cifQuote(c: Column): Column =
    when(c.contains("'"), concat(lit("\""), c, lit("\"")))
      .when(c.rlike("\\s") || c === "", concat(lit("'"), c, lit("'")))
      .otherwise(c)

  private def num2(c: Column): Column =
    coalesce(format_string("%.2f", c), lit("?"))

  /** Render atoms as full-fidelity `_atom_site` mmCIF rows (the same
    * field set BioPython's MMCIFIO preserves: type_symbol, alt id,
    * label_* ids, insertion code, occupancy, B-factor — py:341-345).
    * Atom order is the source file order (`ordinal`), not a re-sort, and
    * serials are renumbered sequentially in that order, matching
    * MMCIFIO's writer. Returns (file_key, ord, line) — callers pick
    * `file_key` (e.g. job_dir or job_dir/model_idx) and feed
    * [[writeKeyedText]]. `modelNum` fills pdbx_PDB_model_num (AF3 source
    * files are single-model, so the default is 1).
    */
  def renderCif(
      atoms: DataFrame,
      fileKey: Column,
      modelNum: Column = lit(1)): DataFrame = {
    // format_string, NOT format_number: the latter inserts thousands
    // separators ("1,234.500") which no CIF consumer can read back
    def coord(c: Column) = format_string("%.3f", c)
    val line = concat_ws(" ",
      col("group_pdb"), col("atom_serial"), col("type_symbol"),
      cifQuote(col("atom_name")), col("alt_id"), col("res_name"),
      col("label_asym_id"), col("entity_id"), col("label_seq_id"),
      col("ins_code"),
      coord(col("x")), coord(col("y")), coord(col("z")),
      num2(col("occupancy")), num2(col("b_iso")),
      col("res_id"), col("chain"), modelNum)
    atoms
      .withColumn("atom_serial",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(fileKey).orderBy(col("ordinal"), col("chain"), col("res_id"), col("atom_name"))))
      .select(fileKey.as("file_key"), col("atom_serial").as("ord"), line.as("line"))
  }

  private val header: String =
    """#
      |loop_
      |_atom_site.group_PDB
      |_atom_site.id
      |_atom_site.type_symbol
      |_atom_site.label_atom_id
      |_atom_site.label_alt_id
      |_atom_site.label_comp_id
      |_atom_site.label_asym_id
      |_atom_site.label_entity_id
      |_atom_site.label_seq_id
      |_atom_site.pdbx_PDB_ins_code
      |_atom_site.Cartn_x
      |_atom_site.Cartn_y
      |_atom_site.Cartn_z
      |_atom_site.occupancy
      |_atom_site.B_iso_or_equiv
      |_atom_site.auth_seq_id
      |_atom_site.auth_asym_id
      |_atom_site.pdbx_PDB_model_num
      |""".stripMargin

  /** Snapshot the session Hadoop configuration as a serializable map —
    * a fresh Configuration() on an executor would drop every
    * spark.hadoop.* setting (credentials, custom schemes). Same pattern
    * as CifScan.createReaderFactory.
    */
  private def confProps(df: DataFrame): Map[String, String] = {
    val c = df.sparkSession.sparkContext.hadoopConfiguration
    val b = Map.newBuilder[String, String]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  private def rebuildConf(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `(file_key, ord, line)` rows as `outDir/<file_key><suffix>`,
    * one file per key, lines in `ord` order, optional per-file header.
    * Scales: keys are hash-distributed across tasks; each task writes only
    * its partition's keys, through the cluster filesystem.
    */
  def writeKeyedText(
      rendered: DataFrame,
      outDir: String,
      suffix: String,
      withCifHeader: Boolean = false): Unit = {
    val hdr = if (withCifHeader) header else ""
    val props = confProps(rendered)
    rendered
      .repartition(col("file_key"))
      .sortWithinPartitions(col("file_key"), col("ord"))
      .select("file_key", "line")
      .foreachPartition { (rows: Iterator[Row]) =>
        val conf = rebuildConf(props)
        var current: String = null
        var writer: java.io.BufferedWriter = null
        def close(): Unit = if (writer != null) { writer.close(); writer = null }
        try {
          rows.foreach { r =>
            val key = r.getString(0)
            if (key != current) {
              close(); current = key
              val path = new org.apache.hadoop.fs.Path(outDir, key + suffix)
              val fs = path.getFileSystem(conf)
              // no .crc siblings next to user-facing output (local
              // ChecksumFileSystem writes them by default)
              try fs.setWriteChecksum(false) catch { case _: Exception => () }
              writer = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
                fs.create(path, true), java.nio.charset.StandardCharsets.UTF_8))
              if (hdr.nonEmpty) { writer.write(s"data_$key\n"); writer.write(hdr) }
            }
            writer.write(r.getString(1)); writer.write("\n")
          }
        } finally close()
      }
  }

  /** The reference's dynamic-named CSV report sink (py:304-318): exact
    * reference headers (chain ids interpolated into column names,
    * py:306-312) and a single file named
    * `interaction_analysis_PAE_{pae}_max_dist_{d}.csv`, not a part-file
    * directory — so downstream tooling written for the reference reads it
    * unchanged. The part-file promotion runs through the Hadoop
    * FileSystem of `outDir` (local, HDFS, or object store alike).
    */
  def writeReportCsv(report: DataFrame, outDir: String, p: Af3Params): Unit = {
    val renamed = report
      .withColumnRenamed("folder_name", "Folder_name")
      .withColumnRenamed("contact_residues_poi",
        s"Contact_residues_POI_chain_${p.poiChain}")
      .withColumnRenamed("contact_sequence", "Contact_sequence")
      .withColumnRenamed("interacting_residues_partner",
        s"Interacting_residues_Partner_chain_${p.partnerChain}")
      .withColumnRenamed("interacting_sequence", "Interacting_sequence")
    val name = s"interaction_analysis_PAE_${p.maxPaeCutoff}_max_dist_${p.maxDist}"
    val tmp = s"$outDir/.$name.tmp"
    renamed.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val conf = report.sparkSession.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = tmpPath.getFileSystem(conf)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(tmp, "part-*.csv"))
      .headOption.getOrElse(sys.error(s"no csv part written under $tmp")).getPath
    val target = new org.apache.hadoop.fs.Path(outDir, s"$name.csv")
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(tmpPath, true)
    // the local ChecksumFileSystem drags a .crc along with the rename;
    // the reference's output dir has no such sibling
    val crc = new org.apache.hadoop.fs.Path(outDir, s".$name.csv.crc")
    if (fs.exists(crc)) fs.delete(crc, false)
  }
}
