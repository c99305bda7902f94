package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The dedup corpus-index artifacts (candidate stats / pair graph /
  * labels) are memoized per (session, dir, corpus fingerprint). This spec
  * pins the fingerprint part: regenerating `documents` AT THE SAME PATH
  * must rebuild the pair graph — a (session, dir)-only key would silently
  * serve the previous corpus's pairs.
  */
class ArtifactStalenessSpec extends SparkSpec {

  test("same-path corpus regeneration rebuilds the near-dup pair graph") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gen = java.nio.file.Files.createTempDirectory("graft-stale").toFile.getAbsolutePath
    val fresh = java.nio.file.Files.createTempDirectory("graft-fresh").toFile.getAbsolutePath
    val pairs = SparkEntry.queries("dedup_near_pipeline")

    // generation 1: half the corpus -> builds and caches its pair graph
    src.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$gen/documents.parquet")
    val n1 = pairs(spark, gen).count()

    // control: the full corpus in a never-seen dir
    src.write.mode("overwrite").parquet(s"$fresh/documents.parquet")
    val nFull = pairs(spark, fresh).count()
    assert(n1 != nFull,
      "precondition: half vs full corpus must yield different pair counts")

    // generation 2: full corpus OVERWRITTEN at generation 1's path
    Thread.sleep(1100) // guard against coarse mtime granularity
    src.write.mode("overwrite").parquet(s"$gen/documents.parquet")
    val n2 = pairs(spark, gen).count()
    assert(n2 == nFull,
      s"stale artifact served: same-path rerun returned $n1-era count $n2, expected $nFull")
  }
}
