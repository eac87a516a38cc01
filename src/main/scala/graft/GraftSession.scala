package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Defaults are sized so the same code runs `local[32]` for tests and a
  * 1000-executor cluster unchanged: AQE owns runtime re-planning
  * (partition coalescing, skew-join splitting), shuffle partitions
  * default to the advisory value and get coalesced by AQE, and small
  * dimension tables are broadcast.
  */
object GraftSession {

  def builder(master: Option[String] = None,
              shufflePartitions: Int = defaultCpus): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      // testdata events.ts is parquet TIMESTAMP(NANOS) — illegal for the
      // reader unless surfaced as LongType (Tables.load converts back).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
    // experiment knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overrides any
    // default above (A/B-ing config effects without a rebuild)
    val b2 = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";").toSeq).filter(_.contains("="))
      .foldLeft(b) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2)
        acc.config(k, v)
      }
    master.fold(b2)(b2.master)
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Local session for tests/benchmarks. */
  def local(cpus: Int = defaultCpus): SparkSession = {
    val s = builder(Some(s"local[$cpus]"), shufflePartitions = cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
