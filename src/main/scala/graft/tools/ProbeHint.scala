package graft.tools

import graft.{GraftSession, SparkEntry}

/** Diagnostic: dump the optimized LOGICAL plan (where JoinHint is
  * visible) and the executed plan for the auto range/overlap joins, to
  * root-cause why the fallbackJoin BROADCAST-bad-side hint is absent
  * from the planned BNL joins (r12 verdict #3). Probe only — never
  * registered.
  */
object ProbeHint {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args(1).split(',').toSeq
      else Seq("join_range_auto", "join_overlap_auto")
    val spark = GraftSession.build("probe-hint")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      println(s"========== $name: optimized logical ==========")
      println(df.queryExecution.optimizedPlan.treeString)
      println(s"========== $name: joins with hints ==========")
      df.queryExecution.optimizedPlan.foreach {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          println(s"Join type=${j.joinType} hint=${j.hint} cond=${j.condition}")
        case _ =>
      }
      println(s"========== $name: physical joins ==========")
      df.queryExecution.executedPlan.foreach {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          println(s"BNLJ build=${j.buildSide} cond=${j.condition}")
          println(s"  buildSidePlan=${(j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }).treeString.linesIterator.take(4).mkString(" | ")}")
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          println(s"SMJ keys=${j.leftKeys}")
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          println(s"BHJ build=${j.buildSide}")
        case _ =>
      }
      println(s"========== $name: executed ==========")
      println(df.queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
