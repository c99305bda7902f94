package graft

import org.apache.spark.sql.SparkSession

/** Single place all mains/tests build their SparkSession, so local-mode
  * tuning (shuffle partitions = cores, AQE, UTC) and reader quirks stay
  * consistent. The driver's `events.parquet` has shipped both as parquet
  * TIMESTAMP(NANOS) (readable only via the nanosAsLong legacy flag kept
  * below) and as TIMESTAMP(MICROS, NTZ); [[graft.suite.Registry.tbl]]
  * normalizes either to a session TIMESTAMP.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // coalesce post-shuffle partitions to the advisory size instead of
      // keeping default parallelism: small shuffles collapse to few
      // right-sized tasks (13% whole-suite win locally; also the
      // production-recommended setting — at scale partitions land at the
      // 64MB advisory target rather than a fixed count)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // spark.graft.rangeJoinRewrite.bucket is deliberately NOT set
      // here: a bin size is only meaningful on a known axis (a 15-min
      // bin fits epoch-second sessions but is arbitrary on a price or
      // score column), so a session-wide default would fire the rewrite
      // on every numeric cross-side bound pair. Queries that want it
      // scope the conf around plan construction and force optimization
      // while it is set — see Registry.withRangeBucket
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // probe hook: `SPARK_GRAFT_CONF="k=v;k2=v2"` overrides any of the
    // above for matched A/B runs (e.g. AQE coalesce settings) without
    // code edits — measurement tooling only, nothing reads it in prod.
    // Every applied override is logged to stderr (driver-advice r11):
    // a bench/verify run under a non-default conf must leave a trace,
    // or published numbers could carry unrecorded configuration.
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        System.err.println(s"[graft] SPARK_GRAFT_CONF override: ${k.trim}=${v.trim}")
        builder.config(k.trim, v.trim)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
