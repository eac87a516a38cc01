package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.operators.Analytics

/** Seeded randomized property tests — each property generates many
  * cases and evaluates them in ONE Spark job against a pure-Scala
  * model, so the suite stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: sessionize partitions each user's events with >gap between sessions") {
    val rnd = new Random(42)
    val gapUs = 1800L * 1000000L
    val base = 1700000000000000L
    // 50 users, random event trains with mixed intra/inter-session gaps
    val evs = (1 to 50).flatMap { u =>
      var t = base + rnd.nextInt(100000)
      (1 to 1 + rnd.nextInt(40)).map { i =>
        t += (if (rnd.nextBoolean()) rnd.nextInt(29 * 60) + 1 // stay in session
              else 31 * 60 + rnd.nextInt(7200)) * 1000000L    // break session
        (u.toLong, (u * 1000 + i).toLong, t, 1.0 + rnd.nextInt(100))
      }
    }
    evs.toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_type", lit("click"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-prop-sess/events.parquet")
    val out = Analytics.sessionize(spark, "/tmp/graft-prop-sess")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
    // model: fold the sorted train per user
    val model = evs.groupBy(_._1).map { case (u, rows) =>
      val ts = rows.map(_._3).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > gapUs) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      u -> sessions.map(_.length.toLong).reverse
    }
    val got = out.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(_._2).map(_._3).toList
    }
    assert(got == model)
  }

  test("property: mercator projection inverts within 1e-9 degrees") {
    val rnd = new Random(7)
    val M = 20037508.342789244 / 180.0
    val R = 6378137.0
    val pts = (1 to 500).map { i =>
      (i.toLong, -74.15 + rnd.nextDouble() * 0.4, 40.55 + rnd.nextDouble() * 0.35)
    }
    val out = pts.toDF("id", "lon", "lat")
      .select(col("id"), col("lon"), col("lat"),
        (col("lon") * M).as("x"),
        (log(tan((col("lat") + 90.0) * (math.Pi / 360.0))) * R).as("y"))
      .as[(Long, Double, Double, Double, Double)].collect()
    out.foreach { case (_, lon, lat, x, y) =>
      val lonBack = x / M
      val latBack = math.toDegrees(2 * math.atan(math.exp(y / R))) - 90.0
      assert(math.abs(lonBack - lon) < 1e-9, s"lon $lon -> $lonBack")
      assert(math.abs(latBack - lat) < 1e-9, s"lat $lat -> $latBack")
    }
  }

  test("property: TopK aggregator equals sort-take-k on random groups") {
    val rnd = new Random(13)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(80).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble())
    } // (group, sortKey, id, payload) — sortKey collisions guaranteed
    val ds = rows.toDF("g", "sk", "id", "p").as[(Long, Long, Long, Double)]
    val got = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(graft.functions.TopKAggregator.topK(5).toColumn.name("top"))
      .collect().toMap
    val model = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3, r._4))
        .sortBy { case (sk, id, _) => (-sk, id) }.take(5).toSeq
    }
    assert(got.keySet == model.keySet)
    got.foreach { case (g, top) => assert(top == model(g), s"group $g") }
  }

  test("property: TopKPerGroup physical operator equals sort-take-k with ties and tiny groups") {
    val rnd = new Random(77)
    // groups of size 1..~120 (many smaller than k), guaranteed sortKey
    // ties within groups, plus a k larger than some whole groups
    val rows = (1 to 4000).map { i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "sk", "id")
    val out = graft.plans.GraftOps.topKPerGroup(
        df, Seq("g"), Seq("sk" -> true, "id" -> false), k = 7)
      .select("g", "id", "rn").as[(Long, Long, Long)].collect()
    val model = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (sk, id) => (-sk, id) }
        .take(7).zipWithIndex.map { case ((_, id), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(out.toSet == model, "operator output != sort-take-k model")
    assert(out.length == model.size)
  }

  test("property: TopKPerGroup partial flush keeps results exact at adversarial group cardinality") {
    // force the partial stage to flush every 16 groups while feeding a
    // partition with ~2000 distinct groups (every row its own group,
    // interleaved revisits): output must equal the unbounded-map answer
    val prev = spark.conf.getOption("spark.graft.topkPartialFlushGroups")
    spark.conf.set("spark.graft.topkPartialFlushGroups", "16")
    try {
      val rnd = new Random(99)
      // high cardinality + revisits AFTER a group has been flushed
      val rows = (1 to 6000).map { i =>
        (rnd.nextInt(2000).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val df = rows.toDF("g", "sk", "id").repartition(3)
      val out = graft.plans.GraftOps.topKPerGroup(
          df, Seq("g"), Seq("sk" -> true, "id" -> false), k = 3)
        .select("g", "id", "rn").as[(Long, Long, Long)].collect()
      val model = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sortBy { case (sk, id) => (-sk, id) }
          .take(3).zipWithIndex.map { case ((_, id), i) => (g, id, (i + 1).toLong) }
      }.toSet
      assert(out.toSet == model, "flushed partial stage changed the result")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topkPartialFlushGroups", v)
        case None => spark.conf.unset("spark.graft.topkPartialFlushGroups")
      }
    }
  }

  test("property: Morton spread interleaves losslessly and tiles stay compact") {
    // pure-Scala model of the shift-or-mask ladder
    def spread(v: Long): Long =
      Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
        .foldLeft(v & 0xFFFFL) { case (e, (sh, m)) => (e | (e << sh)) & m }
    def unspread(z: Long): Long = { // inverse ladder
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0xFFFFL
    }
    val rnd = new Random(41)
    val cases = Seq.tabulate(4000)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    // the Column ladder must equal the Scala model on every case
    val viaSpark = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Geo.spread16(col("x"))
          .bitwiseOR(shiftleft(graft.operators.Geo.spread16(col("y")), 1)).as("z"))
      .as[(Long, Long, Long)].collect()
    viaSpark.foreach { case (x, y, z) =>
      assert(z == (spread(x) | (spread(y) << 1)), s"column ladder diverges at ($x,$y)")
      // lossless: both coordinates come back out
      assert(unspread(z) == x && unspread(z >> 1) == y, s"not invertible at ($x,$y)")
      // tile compactness: the high interleaved bits pin BOTH axes'
      // high bits, so any two keys sharing a z>>16 prefix sit in the
      // same 256x256 rectangle — the data-skipping property
      assert((unspread(z) >> 8) == (x >> 8) && (unspread(z >> 1) >> 8) == (y >> 8))
    }
    // distinct inputs -> distinct keys (bijection on the 32-bit domain)
    assert(viaSpark.map(_._3).distinct.length == viaSpark.map(t => (t._1, t._2)).distinct.length)
  }

  test("property: integer-cents round-trips 2-decimal doubles exactly") {
    val rnd = new Random(99)
    val vals = (1 to 10000).map(_ => math.round(rnd.nextDouble() * 1e7) / 100.0)
    val out = vals.toDF("v")
      .select((round(col("v") * 100).cast("long") / 100.0).as("rt"))
      .as[Double].collect()
    vals.zip(out).foreach { case (v, rt) => assert(v == rt, s"$v != $rt") }
  }

  test("property: columnar decode allocates one vector set per partition at tiny batch size") {
    // force 4-row batches over 1000 rows in 3 partitions: reuse means
    // exactly 3 allocations (one per partition) across ~250 batches
    // each, and the results still match the pure-Scala kernel model
    val prev = spark.conf.getOption("spark.graft.mmDecodeBatch")
    spark.conf.set("spark.graft.mmDecodeBatch", "4")
    try {
      val rnd = new Random(7)
      val rows = (1 to 1000).map { i =>
        val data = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(256).toByte)
        (i.toLong, Seq("image", "audio", "video")(i % 3), data)
      }
      // explicit numPartitions: AQE does not coalesce user repartitions
      val df = rows.toDF("doc_id", "kind", "data").repartition(3)
      graft.plans.MmDecodeExec.allocations.set(0)
      val out = graft.plans.MmOps.decode(df).collect()
        .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))))
        .toMap
      assert(graft.plans.MmDecodeExec.allocations.get() == 3,
        s"expected 3 per-partition allocations, got ${graft.plans.MmDecodeExec.allocations.get()}")
      rows.foreach { case (id, _, data) =>
        val cs = data.foldLeft(0L)((a, x) => (a * 31 + (x & 0xff)) % 997)
        assert(out(id) == ((data.length, data.head & 0xff, data.last & 0xff, cs)),
          s"decode mismatch for doc $id")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.mmDecodeBatch", v)
        case None => spark.conf.unset("spark.graft.mmDecodeBatch")
      }
    }
  }

  test("property: salted agg recombines exactly under extreme single-key skew") {
    val rnd = new Random(11)
    // ~90% of 20k rows land on one hot key — the shape that pins a
    // single reducer in a plain groupBy at scale; values are integer
    // cents so partial sums recombine exactly however the salt splits
    val rows = (1 to 20000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 1L else 2L + rnd.nextInt(50)
      (k, rnd.nextInt(1000000).toLong)
    }
    val df = rows.toDF("user_id", "v")
    val salted = Analytics.saltedAgg(df, col("user_id"), col("v"), 16)
      .select("k", "sum_v", "n").as[(Long, Long, Long)].collect().toSet
    val model = rows.groupBy(_._1).map { case (k, rs) =>
      (k, rs.map(_._2).sum, rs.size.toLong)
    }.toSet
    assert(salted == model, "salted recombination diverged from plain aggregation")
  }

  test("cdc_chunks and minhash_sig are SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val text = "the quick brown fox jumps over the lazy dog"
    val r = spark.sql(
      s"SELECT cdc_chunks('$text') AS c, minhash_sig('$text') AS m").collect().head
    assert(r.getSeq[Long](0) ==
      graft.functions.CdcKernel.chunkArray(text.getBytes("UTF-8")).toSeq,
      "SQL-path cdc_chunks must equal the kernel")
    assert(r.getLong(1) == graft.functions.MinHashKernel.signature(text),
      "SQL-path minhash_sig must equal the kernel")
  }

  test("property: clamped CDC bounds lengths but carries sequential state") {
    val rnd = new Random(4242)
    var sequentialObserved = false
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(3000) + 64
      val b = Array.fill(n)((rnd.nextInt(95) + 32).toByte)
      val cs = graft.functions.CdcKernel.chunkArrayClamped(b, 16, 256)
      val lens = cs.map(_ & 1048575L)
      assert(lens.sum == n.toLong, "clamped chunks must still tile")
      // every chunk honors the clamp except the final remainder
      assert(lens.dropRight(1).forall(l => l >= 16 && l <= 256),
        s"interior chunk lengths must sit in [16,256]: ${lens.mkString(",")}")
      assert(lens.last <= 256)
      // sequential dependence, demonstrated: wherever the PURE splitter
      // emits a chunk under minLen, the clamp must suppress that cut —
      // so the clamped split differs, and the suppression point depends
      // on the PREVIOUS cut (state), not on the local window alone
      val pure = graft.functions.CdcKernel.chunkArray(b)
      if (pure.dropRight(1).exists(d => (d & 1048575L) < 16)) {
        assert(!cs.sameElements(pure),
          "a sub-min pure chunk must force the clamped split to diverge")
        sequentialObserved = true
      }
    }
    // the corpus of random inputs must actually exercise the divergence
    // (pure CDC produces sub-16-byte chunks routinely at mask 64)
    assert(sequentialObserved,
      "no input exercised min-length suppression — probe is vacuous")
  }

  test("property: clamped CDC max bound forces cuts the pure splitter never makes") {
    // A constant input has ONE rolling-window value everywhere: either
    // the pure splitter cuts at every position (w%64==0) or never.
    // Pick a byte whose window hash is not ≡ 0 (mod 64) — the pure
    // split is then a single unbounded chunk, and the clamp must cut
    // at EXACTLY maxLen intervals: pure sequential state (each cut is
    // previous-cut + maxLen), the declarative replay's impossibility
    // case documented by the kernel's Scaladoc.
    val b = Array.fill(1000)('x'.toByte)
    val pure = graft.functions.CdcKernel.chunkArray(b)
    assert(pure.length == 1 && (pure.head & 1048575L) == 1000L,
      "probe byte unexpectedly content-cuts; pick another constant")
    val cs = graft.functions.CdcKernel.chunkArrayClamped(b, 16, 256)
    val lens = cs.map(_ & 1048575L)
    assert(lens.dropRight(1).forall(_ == 256L),
      s"max clamp must cut at exactly maxLen: ${lens.mkString(",")}")
    assert(lens.last == 1000L % 256L && lens.sum == 1000L,
      "forced cuts must tile with the remainder last")
  }

  test("property: CDC chunks tile any input and are locally shift-stable") {
    val rnd = new Random(777)
    val P = 2147483647L
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(2000)
      val b = Array.fill(n)((rnd.nextInt(95) + 32).toByte) // printable ascii
      val cs = graft.functions.CdcKernel.chunkArray(b)
      // tiling: lengths sum to input size; empty input → no chunks
      assert(cs.map(_ & 1048575L).sum == n.toLong, "chunks must tile the input")
      if (n == 0) assert(cs.isEmpty)
      // descriptors well-formed
      assert(cs.forall(d => (d >> 20) >= 0 && (d >> 20) < P && (d & 1048575L) > 0))
      // determinism
      assert(cs.sameElements(graft.functions.CdcKernel.chunkArray(b)))
      if (n > 64) {
        // local shift-stability: a single-byte edit at the FRONT leaves
        // every boundary beyond the first window unchanged, so all
        // chunks after the first post-edit boundary are identical
        val edited = b.clone(); edited(0) = (edited(0) ^ 1).toByte
        val cs2 = graft.functions.CdcKernel.chunkArray(edited)
        val tail = cs.reverse.zip(cs2.reverse).takeWhile { case (a, c) => a == c }.length
        // both splits share all chunks except possibly the first one
        // on each side of the edit (the window covers only 8 bytes)
        assert(tail >= math.min(cs.length, cs2.length) - 1,
          s"front edit must not move downstream boundaries (tail=$tail of ${cs.length})")
      }
    }
  }

  test("property: wave-19 integer stagings — OBF floor identity, PSI sign, bbit range") {
    val rnd = new Random(1914)
    // [1] the OBF decision identity the Scaladoc claims: comparing the
    // z-square against (N div k) equals the exact rational inequality
    // z2 * k > N, for every k and any z2 — floors cannot flip a verdict
    val N = 20808000L
    (1 to 20000).foreach { _ =>
      val k = 1L + rnd.nextInt(5)
      val z2 = rnd.nextInt(50000000).toLong
      assert((z2 > N / k) == (z2 * k > N),
        s"OBF floor identity broke at z2=$z2 k=$k")
    }
    // [2] dq_psi's sign argument: with BOTH factors computed from the
    // same clamped counts, floor monotonicity forces sign agreement —
    // every term is non-negative for ANY bucket table
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    (1 to 5000).foreach { _ =>
      val nb = 2 + rnd.nextInt(8)
      val ref = Array.fill(nb)(rnd.nextInt(1000).toLong)
      val cur = Array.fill(nb)(rnd.nextInt(1000).toLong)
      // ensure the windows are non-empty (the operator always has rows
      // on both sides of the cut by construction)
      ref(0) += 1; cur(0) += 1
      val (rt, ct) = (ref.sum, cur.sum)
      (0 until nb).foreach { i =>
        val rc = math.max(ref(i), 1L); val cc = math.max(cur(i), 1L)
        val term = (1000000L * cc / ct - 1000000L * rc / rt) *
          (bits(cc * rt) - bits(rc * ct))
        assert(term >= 0, s"negative PSI term: ref=${ref.toSeq} cur=${cur.toSeq} i=$i")
      }
    }
    // [3] the b-bit estimator staging: the exactly-divisible form equals
    // the textbook floor form and stays inside [0, 1e6]
    (0L to 32L).foreach { a =>
      val est = math.max(0L, (a - 16) * 62500L)
      assert(est == math.max(0L, (2 * a - 32) * 1000000L / 32L))
      assert(est >= 0L && est <= 1000000L)
    }
    // [4] stream_anomaly's variance guard: k*SS - S^2 is non-negative
    // for ANY integer series (Cauchy-Schwarz), so the guard can only
    // fire on genuinely constant prefixes
    (1 to 5000).foreach { _ =>
      val xs = Array.fill(1 + rnd.nextInt(20))(BigInt(rnd.nextInt(2000000) - 1000000))
      val k = BigInt(xs.length)
      val sSum = xs.sum; val ss = xs.map(x => x * x).sum
      val varN = k * ss - sSum * sSum
      assert(varN >= 0, s"negative variance numerator on ${xs.toSeq}")
      if (xs.distinct.length == 1) assert(varN == 0)
    }
  }

  test("property: wave 23-33 integer stagings — gini range, grid bound, CMS one-sidedness") {
    val rnd = new Random(2333)
    // [1] the closed-form Gini on ANY positive multiset lands in
    // [0, 1e6) and is 0 exactly on constant multisets
    (1 to 5000).foreach { _ =>
      val xs = Array.fill(1 + rnd.nextInt(50))(1L + rnd.nextInt(100000))
        .sorted
      val n = BigInt(xs.length); val sSum = xs.map(BigInt(_)).sum
      val a = xs.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val g = (BigInt(2) * a - (n + 1) * sSum) * 1000000 / (n * sSum)
      assert(g >= 0 && g < 1000000, s"gini out of range on ${xs.toSeq}")
      if (xs.distinct.length == 1) assert(g == 0, "constant multiset must be equal")
    }
    // [2] the grid-quantile geometry bound: for ANY values and width,
    // the midpoint of the exact value's bucket is within w/2
    (1 to 5000).foreach { _ =>
      val w = Seq(16L, 64L, 256L)(rnd.nextInt(3))
      val v = rnd.nextInt(2000000).toLong
      val est = (v / w) * w + w / 2
      assert(math.abs(est - v) <= w / 2, s"grid bound broke at v=$v w=$w")
    }
    // [3] CMS one-sidedness: min-over-lanes of cell sums can never be
    // below the key's own count, at any width
    val lanes = Seq((1103515245L, 12345L), (1140671485L, 12820163L),
      (214013L, 2531011L), (69069L, 1L))
    (1 to 300).foreach { _ =>
      val w = Seq(8L, 64L, 1024L)(rnd.nextInt(3))
      val keys = Array.fill(1 + rnd.nextInt(200))(rnd.nextInt(5000).toLong)
      val counts = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      def cell(i: Int, u: Long) = (u * lanes(i)._1 + lanes(i)._2) % 2147483647L % w
      counts.foreach { case (u, n) =>
        val est = (0 until 4).map { i =>
          counts.filter { case (v, _) => cell(i, v) == cell(i, u) }.values.sum
        }.min
        assert(est >= n, s"CMS undercounted u=$u at w=$w")
      }
    }
    // [4] the watermark-curve monotonicity: widening the threshold can
    // only drop fewer events, for ANY lateness multiset
    (1 to 2000).foreach { _ =>
      val lb = Array.fill(rnd.nextInt(50))(rnd.nextInt(100) * 3600000000L)
      val drops = Seq(1L, 6L, 24L, 72L).map(h => lb.count(_ > h * 3600000000L))
      assert(drops == drops.sorted.reverse, s"drop curve not monotone on ${lb.toSeq}")
    }
    // [5] the vacuum-exec conservation identity: under either action,
    // rows_after + dropped = rows_before and bytes reconcile
    (1 to 2000).foreach { _ =>
      val n = 1L + rnd.nextInt(1000); val dead = rnd.nextInt(n.toInt + 1).toLong
      val rewrite = dead * 1000000L / n >= 300000L
      val after = if (rewrite) n - dead else n
      assert(after + (if (rewrite) dead else 0L) == n)
      assert(after >= 0 && after <= n)
    }
  }
}
