package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.af3._

/** Scratch profiler for the af3_report pipeline — times each stage's
  * action separately to locate the bench regression. Not part of the
  * driver contract.
  */
object ProfileAf3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile-af3")
    val fx = "/root/repo/src/test/resources/af3"
    val p = Af3Params()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm the session with a trivial job
    spark.range(10).count()

    time("e2e_first") { Af3Pipeline.run(spark, fx, p).count() }
    time("e2e_second") { Af3Pipeline.run(spark, fx, p).count() }

    val binders = time("gate") {
      val b = Af3Pipeline.gate(Af3Io.readSummaries(spark, fx), p)
        .select("job_dir").distinct().cache()
      b.count(); b
    }
    val atoms = CifParser.readAtomsLeanDf(spark, fx)
      .join(broadcast(binders), Seq("job_dir"), "left_semi")
    val model0 = atoms.filter(col("model_idx") === 0).cache()
    time("atoms_model0") { model0.count() }
    val info = time("chainInfo") {
      val i = Af3Pipeline.chainInfo(model0).cache(); i.count(); i
    }
    val pae = time("paeLong") {
      val q = Af3Io.readPaeLong(spark, fx)
        .join(broadcast(binders), Seq("job_dir"), "left_semi")
      q.count(); q
    }
    val interacting = time("interacting") {
      val q = Af3Pipeline.interactingResidues(pae, info, p).cache(); q.count(); q
    }
    val contacts = time("contacts") {
      val q = Af3Pipeline.contactPairs(model0, interacting, p).cache(); q.count(); q
    }
    val islands = time("islands") {
      val q = Af3Pipeline.interactionIslands(contacts); q.count(); q
    }
    time("report") { Af3Pipeline.report(islands, info, p).count() }

    spark.stop()
  }
}
