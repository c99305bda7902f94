package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 1000L).map(i => (i, s"src${i % 7}"))
    .toDF("doc_id", "source")

  test("hashSplit is exhaustive, deterministic, and partitioning-independent") {
    val a = Sampling.hashSplit(docs, "doc_id",
      Seq(("train", 80), ("dev", 10), ("test", 10)))
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    // hash balance: train within [70%, 90%] of rows
    assert(counts("train") > 700 && counts("train") < 900)
    // the same rows land in the same split regardless of partitioning
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id",
      Seq(("train", 80), ("dev", 10), ("test", 10)))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratifiedSample keeps ~permille of every stratum") {
    val s = Sampling.stratifiedSample(docs, "source", "doc_id", 200)
    val perSrc = s.groupBy("source").count().collect().map(_.getLong(1))
    assert(perSrc.length === 7)                    // every stratum represented
    assert(perSrc.forall(n => n > 10 && n < 50))   // ~28.6 expected per stratum
    // sample is a subset of the input
    assert(s.exceptAll(docs).isEmpty)
  }

  test("topNPerStratum returns exactly n rows per stratum, stable under reruns") {
    val t1 = Sampling.topNPerStratum(docs, "source", "doc_id", 4)
    assert(t1.groupBy("source").count().collect().forall(_.getLong(1) === 4L))
    val t2 = Sampling.topNPerStratum(docs.repartition(17), "source", "doc_id", 4)
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
  }
}
