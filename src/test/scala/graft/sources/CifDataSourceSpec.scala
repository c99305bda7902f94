package graft.sources

import graft.SparkSpec
import graft.af3.CifParser
import org.apache.spark.sql.functions._

class CifDataSourceSpec extends SparkSpec {

  test("DSv2 'cif' format reads the same atoms as the flatMap parser") {
    val viaDsv2 = spark.read.format("cif").load(fixtureDir)
    val viaFlatMap = CifParser.readAtomsDf(spark, fixtureDir)
    assert(viaDsv2.count() === viaFlatMap.count())
    assert(viaDsv2.exceptAll(viaFlatMap).isEmpty &&
      viaFlatMap.exceptAll(viaDsv2).isEmpty)
  }

  test("one input partition per cif file (parallelism == files)") {
    val df = spark.read.format("cif").load(fixtureDir)
    assert(df.rdd.getNumPartitions === 5) // 5 models in the fixture tree
  }

  test("column pruning: selecting two columns still works") {
    val xs = spark.read.format("cif").load(fixtureDir)
      .filter(col("job_dir") === "job_binder" && col("model_idx") === 0)
      .select("chain", "res_id").distinct()
    assert(xs.count() === 12 + 15) // 12 A residues + 14 B + LIG
  }

  test("column pruning reaches the scan: ReadSchema holds only the requested fields") {
    val narrow = spark.read.format("cif").load(fixtureDir).select("chain", "x")
    val scans = narrow.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("chain", "x"))
    // and the pruned read agrees with the full read's projection
    val full = spark.read.format("cif").load(fixtureDir).select("chain", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    assert(narrow.collect().map(r => (r.getString(0), r.getDouble(1))).sorted
      === full)
  }

  test("pruning to a fidelity field still takes the full parse (b_iso intact)") {
    val b = spark.read.format("cif").load(fixtureDir)
      .filter(col("job_dir") === "job_binder" && col("model_idx") === 0)
      .select("b_iso").limit(1).collect()
    assert(b.head.getDouble(0) === 50.0)
  }
}
