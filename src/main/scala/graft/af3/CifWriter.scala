package graft.af3

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** mmCIF rendering + distributed per-key text file sink.
  *
  * The reference writes one file per job via BioPython's MMCIFIO
  * (py:338-345, 423-427) and one `.pml` per job (py:533-535). Spark's
  * native writers produce one *directory* per partition; AF3 consumers
  * expect single named files, so the sink repartitions by file key and has
  * each executor task stream its keys' rows to exact paths — distributed,
  * no driver collect, deterministic order via an explicit sort.
  */
object CifWriter {

  /** Render atoms as minimal `_atom_site` mmCIF rows. Returns
    * (file_key, ord, line) — callers pick `file_key` (e.g. job_dir or
    * job_dir/model_idx) and feed [[writeKeyedText]].
    */
  def renderCif(atoms: DataFrame, fileKey: org.apache.spark.sql.Column): DataFrame = {
    // format_string, NOT format_number: the latter inserts thousands
    // separators ("1,234.500") which no CIF consumer can read back
    def coord(c: org.apache.spark.sql.Column) = format_string("%.3f", c)
    val line = concat_ws(" ",
      lit("ATOM"), col("atom_serial"), col("atom_name"), lit("."), col("res_name"),
      col("chain"), col("res_id"),
      coord(col("x")), coord(col("y")), coord(col("z")),
      col("chain"), lit(1)) // auth_asym_id, pdbx_PDB_model_num
    atoms
      .withColumn("atom_serial",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(fileKey).orderBy(col("chain"), col("res_id"), col("atom_name"))))
      .select(fileKey.as("file_key"), col("atom_serial").as("ord"), line.as("line"))
  }

  private val header: String =
    """#
      |loop_
      |_atom_site.group_PDB
      |_atom_site.id
      |_atom_site.label_atom_id
      |_atom_site.label_alt_id
      |_atom_site.label_comp_id
      |_atom_site.label_asym_id
      |_atom_site.auth_seq_id
      |_atom_site.Cartn_x
      |_atom_site.Cartn_y
      |_atom_site.Cartn_z
      |_atom_site.auth_asym_id
      |_atom_site.pdbx_PDB_model_num
      |""".stripMargin

  /** Write `(file_key, ord, line)` rows as `outDir/<file_key><suffix>`,
    * one file per key, lines in `ord` order, optional per-file header.
    * Scales: keys are hash-distributed across tasks; each task writes only
    * its partition's keys.
    */
  def writeKeyedText(
      rendered: DataFrame,
      outDir: String,
      suffix: String,
      withCifHeader: Boolean = false): Unit = {
    val hdr = if (withCifHeader) header else ""
    rendered
      .repartition(col("file_key"))
      .sortWithinPartitions(col("file_key"), col("ord"))
      .select("file_key", "line")
      .foreachPartition { (rows: Iterator[Row]) =>
        var current: String = null
        var writer: java.io.BufferedWriter = null
        def close(): Unit = if (writer != null) { writer.close(); writer = null }
        try {
          rows.foreach { r =>
            val key = r.getString(0)
            if (key != current) {
              close(); current = key
              val f = new java.io.File(outDir, key + suffix)
              f.getParentFile.mkdirs()
              writer = new java.io.BufferedWriter(new java.io.FileWriter(f))
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
    * unchanged.
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
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().find(_.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no csv part written under $tmp"))
    val target = new java.io.File(outDir, s"$name.csv")
    if (target.exists()) target.delete()
    java.nio.file.Files.move(part.toPath, target.toPath)
    dir.listFiles().foreach(_.delete()); dir.delete()
  }
}
