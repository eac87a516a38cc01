package graft

/** Run-to-run determinism guard for the float-emitting queries.
  *
  * The oracle contract (README "Determinism contract") claims doubles
  * are bit-identical across shuffle orders and AQE re-plans because
  * every float is a single division / fixed-order fold over exact
  * integers. That claim must hold not just Spark-vs-DuckDB but
  * Spark-vs-ITSELF: a second evaluation re-plans under AQE with
  * different partition sizes and task orders, so any hidden
  * accumulation-order dependence shows up as a flipped low bit here
  * before it ever reaches the driver's hash gate.
  */
class DeterminismSpec extends SparkSpec {

  // the queries whose output carries doubles produced near float
  // hazards: cosine folds, k-means codebooks, ratio divisions,
  // variance z-scores, percentile interpolation, sqrt normalizers
  private val risky = Seq(
    "dedup_embedding", "ann_pq", "ann_ivf", "ann_bruteforce",
    "corpus_mixture", "q8_market_share", "events_anomaly",
    "agg_percentile", "events_ewma",
    // r7d: profit/value doubles divided off DECIMAL(38,0) accumulators
    "q9_product_profit", "q11_important_parts", "events_value_histogram",
    // r14: cosine-emitting graph/search faces
    "ann_knn_graph", "ann_recall_curve",
    // r15/r16: the beam walk re-scores visited ids with exact cosine
    "ann_graph_search",
    // r14 w9-11: jaccard-double pairs, cosine-emitting negative miner
    "dedup_containment", "ann_hard_negatives",
    // r14 w19: micro-floored codebook cosines (the rank cut rides them)
    "ann_ood",
    // r14 w32: ttc_sec = single division off exact micros
    "join_asof_forward",
    // r20: cosine doubles surviving five iterative top-K cuts (seed +
    // 4 descent rounds), and jaccard doubles riding the crossmodal link
    "ann_knn_descent", "mm_dedup_crossmodal")

  test("float-emitting queries are bit-identical across two evaluations") {
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    risky.foreach { name =>
      val a = SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
      val b = SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
      assert(a == b, s"$name: two evaluations diverged — a float is " +
        "accumulation-order dependent")
      assert(a.nonEmpty, s"$name: vacuous determinism check")
    }
  }

  test("rank positions are partition-count independent (boundary independence)") {
    // globalRowPos's Scaladoc claims positions are boundary-independent
    // (ties broken inside the total order), so WHERE the sampled range
    // boundaries land — and therefore HOW MANY slices exist — must
    // never change the result. Pin it: the same rank-backed queries
    // under a deliberately different (and prime) shuffle-partition
    // count must produce byte-identical relations. A regression here
    // means a consumer leaked slice-relative state into the output.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(name: String) =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    Seq("corpus_shuffle", "events_rfm", "window_distribution").foreach { name =>
      val at32 = run(name)
      val at7 =
        try {
          spark.conf.set("spark.sql.shuffle.partitions", "7")
          run(name)
        } finally spark.conf.set("spark.sql.shuffle.partitions", before)
      assert(at32.nonEmpty, s"$name: vacuous partition-independence check")
      assert(at32 == at7,
        s"$name: output depends on the shuffle-partition count — " +
          "a slice boundary leaked into the result")
    }
  }

  test("reliable-checkpoint escape hatch is result-identical and actually durable") {
    // spark.graft.checkpointDir routes every stable checkpoint (the
    // rank's range materialization, the graph family's edge relations)
    // through reliable checkpoint() instead of executor-local blocks.
    // The hatch must be pure materialization: byte-identical results
    // with the conf set, and real files under the durable dir proving
    // the routing happened (not a silent fallback to local blocks).
    def run(name: String) =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    val names = Seq("corpus_shuffle", "dedup_components")
    val base = names.map(n => n -> run(n)).toMap
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      spark.conf.set(graft.plans.Checkpoints.ConfKey, ckpt.toString)
      names.foreach { n =>
        assert(base(n).nonEmpty, s"$n: vacuous checkpoint-hatch check")
        assert(run(n) == base(n), s"$n changed under reliable checkpointing")
      }
      def hasFile(f: java.io.File): Boolean = {
        val c = f.listFiles()
        c != null && c.exists(x => x.isFile || hasFile(x))
      }
      assert(hasFile(ckpt), "conf set but no reliable checkpoint files written")
      // Re-pointing the conf must MOVE the context-global checkpoint
      // location (Checkpoints.stable re-pins on conf change) — later
      // same-JVM code must never silently checkpoint into this test's
      // deleted temp dir.
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ckpt2").toFile
      try {
        spark.conf.set(graft.plans.Checkpoints.ConfKey, ckpt2.toString)
        assert(run(names.head) == base(names.head),
          s"${names.head} changed after re-pointing the checkpoint dir")
        assert(hasFile(ckpt2),
          "conf re-pointed but checkpoints still land in the old dir")
      } finally {
        def rm2(f: java.io.File): Unit = {
          val c = f.listFiles(); if (c != null) c.foreach(rm2); f.delete(); ()
        }
        rm2(ckpt2)
      }
    } finally {
      spark.conf.unset(graft.plans.Checkpoints.ConfKey)
      def rm(f: java.io.File): Unit = {
        val c = f.listFiles(); if (c != null) c.foreach(rm); f.delete(); ()
      }
      rm(ckpt)
    }
  }
}
