package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Materialize a k-times scale-up of a test-data dir as real parquet —
  * the data half of the sf1 bench replay (ScaleProbe measures shapes
  * in-memory; this writes a directory `graft.Bench` can point at).
  *
  * Scaling rules per table:
  *  - fact keys shift per copy so key cardinality scales with rows (a
  *    plain union would multiply duplicate multiplicity instead, which
  *    inflates every dedup/join OUTPUT quadratically by construction);
  *    foreign keys shift by the same constant so join fan-out per key
  *    stays at the base distribution;
  *  - `documents.text` gets a per-copy alphabet rotation and
  *    `embeddings.embedding` a per-copy array rotation, so near-dup pair
  *    density stays at the base rate while rows scale k-fold;
  *  - dimension tables (region, nation) are copied unchanged — dims do
  *    not grow with corpus size.
  *
  * `runMain graft.tools.MakeSf [srcDir] [dstDir] [k] [shift]`
  *
  * `shift` (default 1e8) must exceed the source dir's key range: a
  * second-decade build (sf1 -> sf10) needs a larger shift (e.g. 1e10),
  * or copy i's keys collide with copy i+1's first-generation copies and
  * duplicate multiplicity inflates join/dedup outputs quadratically.
  * Note for chained builds: rotations compose (copy (a,b) carries text
  * rotation a+b), so sf10 texts/embeddings form identical-content
  * groups of up to k per equal rotation total — exact-dup rate is
  * higher than at sf1; read output rows alongside times.
  */
object MakeSf {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/root/repo/tmp/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val Shift = if (args.length > 3) args(3).toLong else 100000000L
    val spark = GraftSession.build("graft-makesf")

    def copies(df: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => per(df, i)).reduce(_ unionByName _)

    def shiftKeys(df: DataFrame, i: Int, keys: Seq[String]): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Shift)))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"MAKESF $name rows=${spark.read.parquet(s"$dst/$name.parquet").count()}")
    }

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dims: unchanged
    Seq("region", "nation").foreach(t => write(t, read(t)))

    write("customer", copies(read("customer"))((d, i) => shiftKeys(d, i, Seq("c_custkey"))))
    write("supplier", copies(read("supplier"))((d, i) => shiftKeys(d, i, Seq("s_suppkey"))))
    write("part", copies(read("part"))((d, i) => shiftKeys(d, i, Seq("p_partkey"))))
    write("orders", copies(read("orders"))((d, i) =>
      shiftKeys(d, i, Seq("o_orderkey", "o_custkey"))))
    write("lineitem", copies(read("lineitem"))((d, i) =>
      shiftKeys(d, i, Seq("l_orderkey", "l_partkey", "l_suppkey"))))
    write("events", copies(read("events"))((d, i) =>
      shiftKeys(d, i, Seq("event_id", "user_id"))))
    write("documents", copies(read("documents"))((d, i) =>
      shiftKeys(d, i, Seq("doc_id"))
        .withColumn("text",
          translate(col("text"), Alpha, Alpha.drop(i % 26) + Alpha.take(i % 26)))))
    write("embeddings", copies(read("embeddings"))((d, i) =>
      shiftKeys(d, i, Seq("vec_id"))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${i + 1}, 1000000), " +
            s"slice(embedding, 1, $i))"))))

    spark.stop()
  }
}
