package graft.af3

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CifParserSpec extends SparkSpec {

  test("parses the fixture model_0 atoms exactly (vs independent oracle CSV)") {
    val atoms = CifParser.readAtoms(spark, fixtureDir)
      .filter(a => a.job_dir == "job_binder" && a.model_idx == 0)
      .toDF()
      .select("chain", "res_id", "res_name", "atom_name", "x", "y", "z")

    val expected = spark.read.option("header", "true")
      .schema("chain STRING, res_id INT, res_name STRING, atom_name STRING, x DOUBLE, y DOUBLE, z DOUBLE")
      .csv(s"$fixtureDir/expected_atoms_model0.csv")

    assert(atoms.count() === expected.count())
    assert(atoms.exceptAll(expected).isEmpty && expected.exceptAll(atoms).isEmpty)
  }

  test("reads all 5 models with model_idx from the filename") {
    val models = CifParser.readAtoms(spark, fixtureDir).toDF()
      .filter(col("job_dir") === "job_binder")
      .select("model_idx").distinct().collect().map(_.getInt(0)).sorted
    assert(models.toSeq === Seq(0, 1, 2, 3, 4))
  }

  test("HETATM rows are kept with their residue name") {
    val lig = CifParser.readAtoms(spark, fixtureDir).toDF()
      .filter(col("job_dir") === "job_binder" && col("model_idx") === 0 &&
        col("res_name") === "LIG")
    assert(lig.count() === 4)
    assert(lig.select("chain").distinct().collect().map(_.getString(0)).toSeq === Seq("B"))
  }

  test("tolerates reordered fields and unknown categories") {
    val cif =
      """data_x
        |loop_
        |_pdbx_something.a
        |_pdbx_something.b
        |1 2
        |#
        |loop_
        |_atom_site.Cartn_x
        |_atom_site.Cartn_y
        |_atom_site.Cartn_z
        |_atom_site.group_PDB
        |_atom_site.auth_asym_id
        |_atom_site.auth_seq_id
        |_atom_site.auth_comp_id
        |_atom_site.label_atom_id
        |1.5 2.5 3.5 ATOM Z 7 GLY CA
        |#
        |""".stripMargin
    val out = CifParser.parseAtomSite("j", 0, cif).toList
    assert(out === List(CifAtom("j", 0, "Z", 7, "GLY", "CA", 1.5, 2.5, 3.5)))
  }

  test("truncated rows and loops without coordinates are skipped, not fatal") {
    val truncated =
      """loop_
        |_atom_site.group_PDB
        |_atom_site.auth_asym_id
        |_atom_site.auth_seq_id
        |_atom_site.auth_comp_id
        |_atom_site.label_atom_id
        |_atom_site.Cartn_x
        |_atom_site.Cartn_y
        |_atom_site.Cartn_z
        |ATOM A 1 ALA N 1.0 2.0 3.0
        |ATOM A 2
        |ATOM A 3 GLY CA 4.0 5.0 6.0
        |""".stripMargin
    assert(CifParser.parseAtomSite("j", 0, truncated).map(_.res_id).toList === List(1, 3))

    val noCoords =
      """loop_
        |_atom_site.group_PDB
        |_atom_site.auth_asym_id
        |ATOM A
        |""".stripMargin
    assert(CifParser.parseAtomSite("j", 0, noCoords).isEmpty)
  }

  test("malformed numeric rows are skipped, not fatal") {
    val cif =
      """loop_
        |_atom_site.group_PDB
        |_atom_site.auth_asym_id
        |_atom_site.auth_seq_id
        |_atom_site.auth_comp_id
        |_atom_site.label_atom_id
        |_atom_site.Cartn_x
        |_atom_site.Cartn_y
        |_atom_site.Cartn_z
        |ATOM A x ALA N 0.0 0.0 0.0
        |ATOM A 2 ALA N 1.0 1.0 1.0
        |""".stripMargin
    val out = CifParser.parseAtomSite("j", 0, cif).toList
    assert(out.map(_.res_id) === List(2))
  }
}
