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

  test("mixToSmallest keeps NULL-stratum rows as their own stratum") {
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 10 === 0, lit(null: String))
        .when(col("doc_id") % 3 === 0, lit("fr")).otherwise(lit("en")))
    val mixed = Sampling.mixToSmallest(withNull, "lang", "doc_id")
    val counts = mixed.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the NULL stratum (100 rows, the smallest) survives the gate
    assert(counts.contains(None) && counts(None) > 0)
    // every stratum lands near the smallest stratum's size (hash gate is
    // probabilistic per-row, so allow wide slack around cap = 100)
    assert(counts.values.forall(n => n > 50 && n < 160), counts.toString)
    assert(mixed.exceptAll(withNull).isEmpty)
  }

  test("temperatureSample: alpha=1 keeps everything, alpha=0 equals the balanced mix") {
    // strongly skewed strata: 600 / 300 / 100
    val skewed = (1L to 1000L).map { i =>
      (i, if (i <= 600) "big" else if (i <= 900) "mid" else "small")
    }.toDF("doc_id", "lang")
    val natural = Sampling.temperatureSample(skewed, "lang", "doc_id", alpha = 1.0)
    assert(natural.count() === 1000L) // exponent 0: every threshold is 1e6
    // alpha=0's floored per-million threshold is up to one hash value
    // stricter than mixToSmallest's exact integer cross-multiply, so
    // assert containment + near-equal counts rather than equality
    val flat = Sampling.temperatureSample(skewed, "lang", "doc_id", alpha = 0.0)
    val balanced = Sampling.mixToSmallest(skewed, "lang", "doc_id")
    assert(flat.exceptAll(balanced).isEmpty)
    assert(balanced.count() - flat.count() <= 3)
    // alpha=0.5: kept sizes track sqrt(n_min/n_d) * n_d = sqrt(n_min*n_d)
    val half = Sampling.temperatureSample(skewed, "lang", "doc_id", alpha = 0.5)
    val counts = half.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Map("big" -> math.sqrt(100.0 * 600), "mid" -> math.sqrt(100.0 * 300),
      "small" -> 100.0)
    expect.foreach { case (k, e) =>
      assert(math.abs(counts(k) - e) < 0.4 * e, s"$k: got ${counts(k)}, want ~$e")
    }
  }

  test("tokenBudgetSample: two-level prefix equals a single global window; budget respected") {
    val sized = docs.withColumn("n_tokens", (col("doc_id") % 40 + 1).cast("long"))
    val got = Sampling.tokenBudgetSample(sized, "doc_id", "n_tokens", 3000L, buckets = 16)
      .select("doc_id", "start_tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: the same selection with one global window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("shuffle_key"), col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val ref = sized
      .withColumn("shuffle_key", Sampling.hashBucket(col("doc_id"), 1000000000))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("start_tok") < 3000L)
      .select("doc_id", "start_tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)

    // crossing doc included, next one excluded: max start_tok < budget,
    // and the kept set's token total reaches (or crosses) the budget
    val total = sized.join(
        Sampling.tokenBudgetSample(sized, "doc_id", "n_tokens", 3000L)
          .select("doc_id"), Seq("doc_id"))
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(total >= 3000L)
    // partitioning-independence
    val re = Sampling.tokenBudgetSample(sized.repartition(13), "doc_id",
        "n_tokens", 3000L, buckets = 16)
      .select("doc_id", "start_tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === got)
  }

  test("balanceToMinority equalizes every stratum to the smallest one") {
    // skewed strata: src_k carries 100*(k+1) rows, k = 0..6
    val skewed = (0 until 7).flatMap { k =>
      (1 to 100 * (k + 1)).map(j => (k * 10000L + j, s"src$k"))
    }.toDF("doc_id", "source")
    val minN = skewed.groupBy("source").count()
      .agg(min("count")).collect()(0).getLong(0)
    val bal = Sampling.balanceToMinority(skewed, "source", "doc_id")
    val counts = bal.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.length === 7)
    assert(counts.forall(_ === minN), s"unbalanced: ${counts.toSeq}, min=$minN")
    assert(bal.exceptAll(skewed).isEmpty)          // a subset of the input
    // deterministic and partitioning-independent
    val re = Sampling.balanceToMinority(skewed.repartition(13), "source", "doc_id")
    assert(bal.exceptAll(re).isEmpty && re.exceptAll(bal).isEmpty)
  }

  test("shuffleOrder is a deterministic, partitioning-independent permutation") {
    val a = Sampling.shuffleOrder(docs, "doc_id")
    val ids = a.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted === (1L to 1000L))          // a permutation
    assert(ids !== (1L to 1000L).toSeq)           // not ingestion order
    val b = Sampling.shuffleOrder(docs.repartition(13), "doc_id")
    assert(b.select("doc_id").collect().map(_.getLong(0)).toSeq === ids)
  }
}
