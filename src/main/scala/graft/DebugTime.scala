package graft

/** Ad-hoc profiling entry: times named queries N times each in one
  * session (cold vs warm separates janino/codegen overhead from data
  * time). Accepts a comma-separated query list so a scaling sweep
  * pays the JVM/session startup once per scale, not per query.
  * Usage: runMain graft.DebugTime <sfDir> <query>[,<query>...] [reps] [nosort]
  * The optional 4th arg `nosort` times the Bench nosort leg (presentation
  * Sort stripped, same as the ledger's nosort column) so a flagged
  * nosort cell can be adjudicated in isolation like the warm ones.
  */
object DebugTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    // Fail fast on a mistyped 4th arg (e.g. 'nosrot'): silently timing
    // the sorted leg would hand an adjudication run the wrong column.
    val nosort = args.length > 3 && {
      require(args(3) == "nosort",
        s"unrecognized 4th arg '${args(3)}' (expected 'nosort')")
      true
    }
    val spark = GraftSession.local()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        (if (nosort) Bench.unsorted(df) else df)
          .write.format("noop").mode("overwrite").save()
        // Locale-pinned like Bench.compactLine: tools/bench_canary.py and
        // tools/adjudicate.py parse these lines with a dot-decimal regex,
        // and the f-interpolator honors the JVM default locale.
        println("[debugtime] " + name + " rep" + r + " " +
          String.format(java.util.Locale.ROOT, "%.2f",
            Double.box((System.nanoTime() - t0) / 1e9)) + " s")
      }
    }
    spark.stop()
  }
}
