package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ground-truth check for cross-document boilerplate detection
  * (`text_boilerplate_ngrams`): every reported 5-gram is a real
  * contiguous word window that occurs in at least 3 distinct documents,
  * with counts matching a naive local recount.
  */
class BoilerplateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reported 5-grams match a naive recount over the raw text") {
    val reported = graft.SparkEntry.queries("text_boilerplate_ngrams")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // naive recount: slide a 5-word window over every document locally
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val occurrences = docs.flatMap { case (id, w) =>
      w.sliding(5).filter(_.size == 5).map(g => (g.mkString(" "), id))
    }
    val truth = occurrences.groupBy(_._1).collect {
      case (g, occ) if occ.map(_._2).distinct.size >= 3 =>
        (g, occ.map(_._2).distinct.size.toLong, occ.size.toLong)
    }.toSeq

    assert(reported.nonEmpty, "no boilerplate found — test is vacuous")
    assert(reported.sortBy(_._1).toSeq == truth.sortBy(_._1),
      "boilerplate set diverges from the naive recount")
    reported.foreach { case (g, nd, no) =>
      assert(g.split(" ").length == 5 && no >= nd && nd >= 3)
    }
  }
}
