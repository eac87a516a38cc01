package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on >30min gaps and keeps within-gap events together") {
    // crafted: user 1 has events at t0, t0+10min, t0+50min (gap) , user 2 one event
    val base = 1700000000000000L // epoch micros
    val df = Seq(
      (1L, 1L, base, 10.0),
      (1L, 2L, base + 10L * 60 * 1000000, 20.0),
      (1L, 3L, base + 50L * 60 * 1000000, 30.0),
      (2L, 4L, base, 5.0))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_type", lit("click"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet("/tmp/graft-test/events.parquet")
    val out = Analytics.sessionize(spark, "/tmp/graft-test")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("property: funnel stages match an in-memory model on random events") {
    val rnd = new scala.util.Random(4242)
    val base = 1700000000000000L
    val types = Array("view", "click", "purchase", "signup", "error")
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong,
        base + rnd.nextInt(1 << 30).toLong * 1000L,
        types(rnd.nextInt(types.length)), 1.0)
    }
    rows.toDF("user_id", "event_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-funnel/events.parquet")
    val out = Analytics.eventsFunnel(spark, "/tmp/graft-test-funnel")
      .select("user_id", "t_view", "t_click", "t_purchase")
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // model: first view, first click strictly after it, first purchase
    // strictly after that — per user, over raw micros
    def fmt(us: Long): String = {
      val i = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC).format(i)
    }
    val byUser = rows.groupBy(_._1)
    val model = byUser.flatMap { case (u, es) =>
      val v = es.filter(_._4 == "view").map(_._3).minOption
      v.map { tv =>
        val c = es.filter(e => e._4 == "click" && e._3 > tv).map(_._3).minOption
        val p = c.flatMap(tc => es.filter(e => e._4 == "purchase" && e._3 > tc).map(_._3).minOption)
        u -> ((Some(fmt(tv)), c.map(fmt), p.map(fmt)))
      }
    }
    assert(out == model, s"diff keys: ${(out.keySet | model.keySet).filter(k => out.get(k) != model.get(k))}")
  }

  test("property: retention matrix equals the per-user day-offset model") {
    val rnd = new scala.util.Random(777)
    val base = 1700000000000000L
    val rows = (1 to 1500).map { i =>
      (rnd.nextInt(30).toLong, i.toLong,
        base + rnd.nextInt(20).toLong * 86400000000L + rnd.nextInt(86400).toLong * 1000000L,
        "click", 1.0)
    }
    rows.toDF("user_id", "event_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-ret/events.parquet")
    val out = Analytics.eventsRetention(spark, "/tmp/graft-test-ret")
      .select("cohort_day", "day_offset", "n_users")
      .as[(String, Long, Long)].collect().toSet
    val dayOf = (us: Long) => us / 86400000000L
    val cohorts = rows.groupBy(_._1).view.mapValues(es => es.map(e => dayOf(e._3)).min)
    val model = rows.map(e => (e._1, dayOf(e._3))).distinct
      .groupBy { case (u, d) => (cohorts(u), d - cohorts(u)) }
      .map { case ((cd, off), us) =>
        val date = java.time.LocalDate.ofEpochDay(cd)
        (date.toString, off, us.map(_._1).distinct.size.toLong)
      }.toSet
    assert(out == model, s"extra=${out -- model}\nmissing=${model -- out}")
  }

  test("lifecycle decomposes daily actives into new/retained/resurrected and balances churn") {
    // u1: days 0,1,2  u2: days 0,2 (gap)  u3: day 1 only
    val userDays = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 2L), (3L, 1L))
    userDays.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, d * 86400000000L + u * 1000000L, u, "click", 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-lc/events.parquet")
    val out = Analytics.eventsUserLifecycle(spark, "/tmp/graft-test-lc")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("1970-01-01", 2L, 0L, 0L, 0L),
      ("1970-01-02", 1L, 1L, 0L, 1L),
      ("1970-01-03", 0L, 1L, 1L, 1L),
      ("1970-01-04", 0L, 0L, 0L, 2L)))
    // growth-accounting identity on every consecutive day pair:
    // active(d) = active(d-1) + new(d) + resurrected(d) - churned(d)
    val active = userDays.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    out.sliding(2).foreach {
      case Seq((_, _, _, _, _), (d, nw, rt, rs, ch)) =>
        val day = java.time.LocalDate.parse(d).toEpochDay
        assert(active.getOrElse(day, 0L) ==
          active.getOrElse(day - 1, 0L) + nw + rs - ch)
      case _ =>
    }
  }

  test("q1 aggregates are decimal-exact and grouped correctly") {
    val out = Analytics.q1PricingSummary(spark, sf).collect()
    assert(out.nonEmpty)
    val row = out.head
    val n = row.getAs[Long]("count_order")
    val avgQty = row.getAs[Double]("avg_qty")
    val sumQty = row.getAs[Double]("sum_qty")
    assert(math.abs(avgQty - sumQty / n) < 1e-9)
  }

  test("topk_per_group returns at most 3 rows per customer, ranked") {
    val out = Analytics.topkPerGroup(spark, sf)
    val bad = out.groupBy("o_custkey").agg(count(lit(1)).as("n"),
      max(col("rn")).as("maxrn")).filter(col("n") > 3 || col("maxrn") > 3)
    assert(bad.count() == 0)
  }

  test("saltedAgg equals plain aggregation") {
    val events = graft.sources.Tables.load(spark, sf, "events")
    val plain = events.groupBy(col("user_id")).agg(
      sum(round(col("value") * 100).cast("long")).as("sum_v"),
      count(lit(1)).as("n"))
      .select("user_id", "sum_v", "n").as[(Long, Long, Long)].collect().toSet
    val salted = Analytics.saltedAgg(events, col("user_id"),
      round(col("value") * 100).cast("long"))
      .select("k", "sum_v", "n").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("top-k triplets agree: custom operator = typed aggregator = window formulation") {
    val a = Analytics.topkPerGroup(spark, sf)
      .select("o_custkey", "o_orderkey", "rn").as[(Long, Long, Long)].collect().toSet
    val b = Analytics.topkPerGroupAgg(spark, sf)
      .select("o_custkey", "o_orderkey", "rn").as[(Long, Long, Long)].collect().toSet
    val c = Analytics.topkPerGroupAggTyped(spark, sf)
      .select("o_custkey", "o_orderkey", "rn").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "custom physical operator != window formulation")
    assert(a == c, "typed aggregator != window formulation")
  }

  test("as-of join attributes events to the latest signup at-or-before them") {
    val out = Analytics.joinAsof(spark, sf)
      .select("user_id", "event_type", "us", "asof_signup_us")
      .as[(Long, String, Long, Option[Long])].collect()
    // every attributed timestamp is a signup time <= the event time
    assert(out.forall { case (_, _, us, asof) => asof.forall(_ <= us) })
    // signup events attribute to themselves (delta 0) unless a later
    // same-us signup exists (max over the running frame)
    val perUser = out.groupBy(_._1)
    perUser.values.foreach { rows =>
      val signupTimes = rows.filter(_._2 == "signup").map(_._3).toSet
      rows.foreach { case (_, _, _, asof) =>
        asof.foreach(t => assert(signupTimes.contains(t)))
      }
    }
  }

  test("sketch aggregates stay within error bounds of exact twins") {
    // r20: the faces are BOUND CERTIFICATES — the ok flags are computed
    // from the live sketch on the Spark side, so asserting flag==1 here
    // asserts the estimate landed in its exact bracket. Tightness of
    // the raw estimates vs the exact twins is re-asserted below from
    // inline sketches (the certificate output no longer carries them).
    val cert = Analytics.aggApproxQuantile(spark, sf)
      .select("event_type", "p50_ok", "p90_ok", "p99_ok")
      .as[(String, Long, Long, Long)].collect()
    assert(cert.nonEmpty)
    cert.foreach { case (tp, o50, o90, o99) =>
      assert(o50 == 1 && o90 == 1 && o99 == 1, s"$tp quantile certificate violated")
    }
    val exact = Analytics.aggPercentile(spark, sf)
      .select("event_type", "p50", "p90").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val events = graft.sources.Tables.load(spark, sf, "events")
    events.groupBy("event_type")
      .agg(expr("percentile_approx(value, 0.5, 10000)").as("a50"),
        expr("percentile_approx(value, 0.9, 10000)").as("a90"))
      .select("event_type", "a50", "a90").as[(String, Double, Double)]
      .collect().foreach { case (tp, a50, a90) =>
        val (e50, e90) = exact(tp)
        assert(math.abs(a50 - e50) <= math.max(1.0, e50 * 0.05), s"$tp p50 $a50 vs $e50")
        assert(math.abs(a90 - e90) <= math.max(1.0, e90 * 0.05), s"$tp p90 $a90 vs $e90")
      }
    val exactUsers = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    val hllCert = Analytics.aggApproxDistinct(spark, sf)
      .select("event_type", "n_exact_users", "within_bound")
      .as[(String, Long, Long)].collect()
    assert(hllCert.nonEmpty)
    hllCert.foreach { case (tp, ex, ok) =>
      assert(ex == exactUsers(tp), s"$tp exact column drifted")
      assert(ok == 1, s"$tp HLL certificate violated")
    }
  }

  test("sketch error bounds hold at the driver's correctness scale (sf0.01)") {
    // The two rows-only CORRECTNESS keys (agg_approx_quantile /
    // agg_approx_distinct) get their tightness pinned HERE, at the
    // same scale the driver's gate runs: the hash gate covers their
    // exact _inputs twins, this spec covers the estimates themselves.
    // KLL/GK rank guarantee: percentile_approx(accuracy=10000) puts
    // the estimate within rank epsilon 1/accuracy of the target; we
    // assert containment in the exact-value bracket at ±10x epsilon.
    val eps = 10.0 * (1.0 / 10000.0)
    val ev = graft.sources.Tables.load(spark, sfMid, "events")
    val qs = Seq(0.5, 0.9, 0.99)
    val exact = ev.groupBy(col("event_type")).agg(
        expr(s"percentile(value, array(${qs.map(q => s"${q - eps},${q + eps}").mkString(",")}))")
          .as("br"))
      .select(col("event_type"), col("br"))
      .as[(String, Seq[Double])].collect().toMap
    // the inline sketch (same params as the certificate face) must sit
    // inside the exact rank bracket computed here independently …
    val approx = ev.groupBy(col("event_type"))
      .agg(expr(s"percentile_approx(value, array(${qs.mkString(",")}), 10000)").as("a"))
      .select(col("event_type"), col("a"))
      .as[(String, Seq[Double])].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (tp, as) =>
      val br = exact(tp)
      as.zipWithIndex.foreach { case (a, i) =>
        val (lo, hi) = (br(2 * i), br(2 * i + 1))
        assert(a >= lo && a <= hi,
          s"$tp q=${qs(i)}: approx $a outside rank bracket [$lo, $hi]")
      }
    }
    // … and the registered certificate face must agree: every ok flag 1
    Analytics.aggApproxQuantile(spark, sfMid)
      .select("event_type", "p50_ok", "p90_ok", "p99_ok")
      .as[(String, Long, Long, Long)].collect()
      .foreach { case (tp, o50, o90, o99) =>
        assert(o50 == 1 && o90 == 1 && o99 == 1, s"$tp certificate flag not 1")
      }
    // HLL++ at rsd=0.02: relative error within 3.5 sigma = 7%. The
    // inline sketch must meet the bound the certificate face documents …
    val exactUsers = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    val hll = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("apx"))
      .select("event_type", "apx").as[(String, Long)].collect()
    assert(hll.nonEmpty)
    hll.foreach { case (tp, apx) =>
      val ex = exactUsers(tp)
      assert(math.abs(apx - ex) <= math.max(2.0, ex * 0.07),
        s"$tp: HLL $apx vs exact $ex exceeds 3.5-sigma bound (7%)")
    }
    // … and the registered certificate face must agree
    Analytics.aggApproxDistinct(spark, sfMid)
      .select("event_type", "within_bound").as[(String, Long)].collect()
      .foreach { case (tp, ok) => assert(ok == 1, s"$tp HLL certificate flag not 1") }
  }

  test("bloom pre-filter has zero false negatives and bounded false positives") {
    val exact = graft.sources.Tables.load(spark, sf, "customer")
      .join(graft.sources.Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    val bloomed = Analytics.filterBloom(spark, sf)
      .select("c_custkey").as[Long].collect().toSet
    assert(exact.subsetOf(bloomed), "bloom filter dropped a true member")
    val total = graft.sources.Tables.load(spark, sf, "customer").count()
    val fp = (bloomed -- exact).size
    assert(fp <= math.max(5L, (total - exact.size) / 10), s"too many false positives: $fp")
  }

  test("range join matches only events in the (0, 1h] window after a purchase") {
    val out = Analytics.joinRange(spark, sf)
      .select("purchase_id", "probe_id", "delta_sec").as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (p, e, d) => d > 0 && d <= 3600.0 && p != e })
  }

  test("outer join coalesces one-sided nations; set ops partition the urgent space") {
    val outer = Analytics.joinOuter(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(outer.nonEmpty)
    assert(outer.forall { case (_, c, s) => c >= 0 && s >= 0 && (c > 0 || s > 0) })
    val sets = Analytics.setOps(spark, sf)
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // INTERSECT and EXCEPT of the same left set are disjoint by definition
    assert(sets.getOrElse("urgent_and_high", Set.empty)
      .intersect(sets.getOrElse("urgent_only", Set.empty)).isEmpty)
  }

  test("range-frame window sums exactly the trailing hour") {
    val rows = Analytics.windowRangeFrame(spark, sf)
      .select("user_id", "us", "trailing_1h_events").as[(Long, Long, Long)].collect()
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { evs =>
      val sorted = evs.sortBy(_._2)
      sorted.foreach { case (_, us, n) =>
        // RANGE frame bounds are inclusive on both ends
        val expect = sorted.count(e => e._2 >= us - 3600L * 1000000L && e._2 <= us)
        assert(n == expect, s"at us=$us expected $expect in frame, got $n")
      }
    }
  }

  test("join_semi + join_anti partition the urgent-order space") {
    val semiN = Analytics.joinSemi(spark, sf).count()
    val antiN = Analytics.joinAnti(spark, sf).count()
    val custN = graft.sources.Tables.load(spark, sf, "customer").count()
    assert(semiN <= custN && antiN <= custN)
    // anti is w.r.t. urgent orders only; semi is w.r.t. any order
    assert(semiN + antiN >= custN) // every customer is in semi; anti ⊂ semi
  }

  test("events_anomaly reproduces the exact-moments z-score top-100") {
    val got = Analytics.eventsAnomaly(spark, sf)
      .select("event_id", "event_type", "cents", "z_micro")
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == 100)
    // independent model: collect raw events, exact integer moments,
    // identical IEEE formula order
    val raw = graft.sources.Tables.load(spark, sf, "events")
      .select("event_id", "event_type", "value").as[(Long, String, Double)].collect()
      .map { case (id, t, v) => (id, t, Math.round(v * 100)) }
    val moments = raw.groupBy(_._2).map { case (t, rows) =>
      val n = rows.length.toLong
      val sSum = rows.map(_._3).sum
      val ss = rows.map(r => r._3 * r._3).sum
      t -> ((n, sSum, ss))
    }
    val zOf = raw.map { case (id, t, c) =>
      val (n, sSum, ss) = moments(t)
      val mu = sSum.toDouble / n
      (id, (c.toDouble - mu) / math.sqrt(ss.toDouble / n - mu * mu))
    }.toMap
    val expectTop = zOf.toSeq.sortBy { case (id, z) => (-math.abs(z), id) }.take(100)
    assert(got.map(_._1).toSeq == expectTop.map(_._1),
      "top-100 membership/order differs from the exact model")
    got.foreach { case (id, _, _, zMicro) =>
      assert(zMicro == math.floor(zOf(id) * 1e6 + 0.5).toLong, s"z_micro off for $id")
    }
  }

  test("join_skew_salted equals the plain unsalted join") {
    val salted = Analytics.joinSkewSalted(spark, sf)
      .select("join_key", "tier", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(
        when(pmod(col("event_id"), lit(10)) < 7, lit(-1L))
          .otherwise(pmod(col("user_id"), lit(50))).as("join_key"),
        round(col("value") * 100).cast("long").as("vc"))
    val dim = spark.range(-1, 50).select(col("id").as("join_key"),
      concat(lit("tier"), pmod(col("id") + 50, lit(4))).as("tier"))
    val plain = e.join(dim, "join_key")
      .groupBy(col("join_key"), col("tier"))
      .agg(count(lit(1)).as("n_events"), (sum(col("vc")) / 100.0).as("sum_value"))
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq, "salting changed the join result")
    // the hot key really is hot: ~70% of all events
    val hot = salted.filter(_._1 == -1L).map(_._3).sum
    val total = salted.map(_._3).sum
    assert(hot * 10 >= total * 6 && hot * 10 <= total * 8,
      s"hot key carries $hot of $total events — expected ~70%")
  }

  test("events_markov transitions match a direct per-user path recompute") {
    import spark.implicits._
    val got = Analytics.eventsMarkov(spark, sf)
      .as[(String, String, Long, Long)].collect()
      .map { case (f, t, n, p) => (f, t) -> ((n, p)) }.toMap
    val evs = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val model = evs.groupBy(_._1).values.flatMap { u =>
      u.sortBy(r => (r._2, r._3)).sliding(2).collect {
        case Array(a, b) if b._2 - a._2 <= 1800000000L => (a._4, b._4)
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == model, "transition counts drifted")
    // per-from probabilities: floor(n*1e6/total), rows sum to ≤ 1e6
    got.groupBy(_._1._1).foreach { case (f, rs) =>
      val total = rs.values.map(_._1).sum
      rs.foreach { case ((_, _), (n, p)) => assert(p == n * 1000000L / total) }
      val pSum = rs.values.map(_._2).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.size,
        s"$f probabilities sum $pSum")
    }
  }

  test("events_gap_fill produces a dense grid with exact zero-fill accounting") {
    import spark.implicits._
    val rows = Analytics.eventsGapFill(spark, sf)
      .select("hour", "event_type", "n_events", "filled")
      .as[(String, String, Long, Long)].collect()
    val hours = rows.map(_._1).distinct.sorted
    val types = rows.map(_._2).distinct
    assert(rows.length == hours.length * types.length, "grid must be dense")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    rows.foreach { case (h, t, n, f) =>
      assert(if (f == 1L) n == 0L else n > 0L, s"($h,$t) fill flag vs count")
    }
    // the range is exactly the observed span: first and last hours are real
    val firstReal = rows.filter(_._1 == hours.head)
    val lastReal = rows.filter(_._1 == hours.last)
    assert(firstReal.exists(_._4 == 0L) && lastReal.exists(_._4 == 0L),
      "bounds hours must contain at least one observed cell")
  }

  test("events_ewma matches a direct integer recompute of the truncated recurrence") {
    import spark.implicits._
    val rows = Analytics.eventsEwma(spark, sf)
      .select("hour", "event_type", "n_events", "ewma_scaled", "ewma")
      .as[(String, String, Long, Long, Double)].collect()
    rows.groupBy(_._2).foreach { case (_, series) =>
      val s = series.sortBy(_._1)
      val counts = s.map(_._3)
      s.zipWithIndex.foreach { case ((h, t, _, scaled, ewma), i) =>
        val want = (0 to 24).map { k =>
          (if (i - k >= 0) counts(i - k) else 0L) * (1L << (24 - k))
        }.sum
        assert(scaled == want, s"($h,$t) scaled recurrence")
        assert(ewma == want / 16777216.0, s"($h,$t) dyadic scaling must be exact")
      }
    }
  }

  test("skyline_pareto equals the quadratic dominance model") {
    val parts = graft.sources.Tables.load(spark, sf, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("pc"), col("p_size"))
      .as[(Long, Long, Int)].collect()
    val model = parts.filter { case (_, pc, sz) =>
      !parts.exists { case (_, qc, qz) =>
        (qc < pc && qz >= sz) || (qc <= pc && qz > sz)
      }
    }.map { case (k, pc, sz) => (k, pc, sz.toLong) }.toSet
    val got = Analytics.skylinePareto(spark, sf)
      .select(col("p_partkey"), col("price_cents"), col("p_size").cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(got.toSet == model, "sort-prune skyline drifted from the dominance definition")
    // frontier shape: ascending price must mean strictly ascending size
    val sorted = got.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, pa, sa), (_, pb, sb)) =>
        assert(pa <= pb && (pa == pb || sa < sb), "frontier must strictly improve")
      case _ =>
    }
  }

  test("events_cooccurrence support and lift match an in-memory session model") {
    val evs = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    // replay the 30-min-gap sessionizer per user
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var sid = 0L; var prev = Long.MinValue
      ordered.map { case (_, _, us, tpe) =>
        if (prev != Long.MinValue && us - prev > 1800000000L) sid += 1
        prev = us
        ((u, sid), tpe)
      }
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val n = sessions.size.toLong
    val perType = sessions.values.toSeq.flatMap(_.toSeq).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    val support = sessions.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val got = Analytics.eventsCooccurrence(spark, sf)
      .select("type_a", "type_b", "support", "lift_ppm")
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == support,
      "support counts drifted from the session model")
    got.foreach { case (a, b, sup, lift) =>
      assert(lift == sup * n * 1000000L / (perType(a) * perType(b)),
        s"($a,$b) lift_ppm")
      assert(sup <= math.min(perType(a), perType(b)), "support bound")
    }
  }

  test("agg_grouping_sets is the union of the two single-column marginals") {
    val rows = Analytics.aggGroupingSets(spark, sf)
      .select("gid", "l_returnflag", "l_linestatus", "revenue", "n_items")
      .as[(Long, Option[String], Option[String], Double, Long)].collect()
    // gid 1 = linestatus aggregated away, gid 2 = returnflag aggregated away
    assert(rows.forall(r => r._1 == 1L || r._1 == 2L))
    val byFlag = rows.filter(_._1 == 1L)
    val byStatus = rows.filter(_._1 == 2L)
    assert(byFlag.forall(r => r._2.isDefined && r._3.isEmpty))
    assert(byStatus.forall(r => r._2.isEmpty && r._3.isDefined))
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("epc"))
      .as[(String, String, Long)].collect()
    def marginal[K](key: ((String, String, Long)) => K): Map[K, (Double, Long)] =
      li.groupBy(key).map { case (k, v) =>
        k -> (v.map(_._3).sum / 100.0, v.size.toLong)
      }
    assert(byFlag.map(r => r._2.get -> (r._4, r._5)).toMap == marginal(_._1))
    assert(byStatus.map(r => r._3.get -> (r._4, r._5)).toMap == marginal(_._2))
    // one pass over the fact: the plan must contain a single scan + Expand
    val plan = Analytics.aggGroupingSets(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets should compile to one Expand, not a union of scans")
  }

  test("events_anomaly_robust equals an exact doubled-median/MAD model") {
    val evs = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1) // 1-based ranks (n+1)/2, (n+2)/2
    }
    val byType = evs.groupBy(_._2)
    val scored = byType.values.flatMap { rows =>
      val m2 = med2(rows.map(_._3).toSeq)
      val ds = rows.map { case (id, t, c) => (id, t, c, math.abs(2 * c - m2)) }
      val mad2 = med2(ds.map(_._4).toSeq)
      ds.map { case (id, t, c, d) =>
        val score = if (mad2 > 0) (BigInt(d) * 2000000 / mad2).toLong else 0L
        (id, t, c, score)
      }
    }.toSeq
    val model = scored.sortBy(r => (-r._4, r._1)).take(100)
      .map(r => (r._1, r._2, r._3, r._4))
    val got = Analytics.eventsAnomalyRobust(spark, sf)
      .select("event_id", "event_type", "cents", "score_micro")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == model, "robust scores drifted from the exact model")
    // robustness is the point: median score must be far below the top
    // (heavy tail detected), and no NaN/zero-variance pathology exists
    assert(got.head._4 > 0, "top outlier must carry a positive score")
  }

  test("cooccurrence drift lags are internally consistent per pair") {
    val rows = Analytics.eventsCooccurrenceDrift(spark, sf)
      .select("day", "type_a", "type_b", "lift_ppm", "prev_lift_ppm", "delta_ppm")
      .as[(String, String, String, Long, Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).values.foreach { series =>
      val s = series.sortBy(_._1)
      // first observed day has no previous; later days chain exactly
      assert(s.head._5.isEmpty && s.head._6.isEmpty, "first observation must have null prev")
      s.sliding(2).foreach {
        case Array(p, c) =>
          assert(c._5.contains(p._4), s"(${c._2},${c._3}) ${c._1}: prev must be last observed lift")
          assert(c._6.contains(c._4 - p._4), "delta must be lift - prev")
        case _ =>
      }
    }
    // drift must actually move somewhere (non-vacuous monitor)
    assert(rows.exists(_._6.exists(_ != 0L)), "no pair ever changed lift")
  }

  test("agg_hll_replay registers and estimate match a direct sketch replay") {
    val users = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id").as[Long].collect().distinct
    def bits(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val regs = Array.fill(64)(0L)
    users.foreach { u =>
      val h = (1103515245L * u + 12345L) % 2147483647L
      val j = (h % 64).toInt
      val rho = 26L - bits(h / 64 + 1)
      if (rho > regs(j)) regs(j) = rho
    }
    val sSum = regs.map(m => 1L << (26 - m)).sum
    val est = 709L * 4096L * (1L << 26) / sSum
    val vZero = regs.count(_ == 0L).toLong
    val got = Analytics.aggHllReplay(spark, sf)
      .select("n_exact", "v_zero", "est_milli").as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (nExact, v, e) = got.head
    assert(nExact == users.length.toLong)
    assert(v == vZero, "empty-register count drifted")
    assert(e == est, "estimate drifted from the direct sketch replay")
    // the sketch must actually estimate: apply the documented consumer
    // contract — linear counting from v_zero in the small range (raw
    // HLL over-estimates by design when n ≪ m), raw HLL otherwise —
    // and require the corrected estimate inside the ±35% envelope
    val corrected =
      if (e / 1000.0 <= 2.5 * 64 && v > 0) 64.0 * math.log(64.0 / v)
      else e / 1000.0
    assert(math.abs(corrected - nExact) <= 0.35 * nExact,
      s"corrected estimate $corrected implausibly far from $nExact")
  }

  test("agg_hll_curve: per-m sketch replay, m=64 row matches agg_hll_replay") {
    val users = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id").as[Long].collect().distinct
    def bits(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val expected = Seq((16, 673L, 28), (64, 709L, 26), (256, 712L, 24))
      .map { case (m, alpha, r) =>
        val regs = Array.fill(m)(0L)
        users.foreach { u =>
          val h = (1103515245L * u + 12345L) % 2147483647L
          val j = (h % m).toInt
          val rho = r.toLong - bits(h / m + 1)
          if (rho > regs(j)) regs(j) = rho
        }
        val sSum = regs.map(mj => 1L << (r - mj)).sum
        val est = alpha * m * m * (1L << r) / sSum
        val n = users.length.toLong
        (m.toLong, n, est, math.abs(est - 1000 * n) * 1000 / n)
      }.toSet
    val got = Analytics.aggHllCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSet == expected, "curve diverged from the direct sketch replay")
    // cross-face identity: the m=64 lane IS agg_hll_replay's estimate
    val rep = Analytics.aggHllReplay(spark, sf)
      .select("est_milli").as[Long].collect().head
    assert(got.find(_._1 == 64L).get._3 == rep, "m=64 row drifted from agg_hll_replay")
  }

  test("events_metric_tree: in-memory decomposition replay, conservation by construction") {
    val evs = graft.sources.Tables.load(spark, sf, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(expr("unix_micros(ts) div 86400000000"), col("user_id"),
        col("event_type"), expr("CAST(round(value*100) AS BIGINT)"))
      .as[(Long, Long, String, Long)].collect()
    val daily = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rows) =>
      (d, rows.map(_._2).distinct.length.toLong,
        rows.count(_._3 == "purchase").toLong,
        rows.filter(_._3 == "purchase").map(_._4).sum)
    }
    def fdiv(num: BigInt, den: BigInt): Long =
      (if (num >= 0) num / den else -((-num + den - 1) / den)).toLong
    val expected = daily.zip(daily.tail).filter(_._1._3 > 0).map {
      case ((_, u1, p1, r1), (d, u2, p2, r2)) =>
        val tu = fdiv(BigInt(1000000) * (u2 - u1) * r1, u1)
        val tf = fdiv(BigInt(1000000) * r1 * (p2 * u1 - p1 * u2), BigInt(u1) * p1)
        val tv = fdiv(BigInt(1000000) * (r2 * p1 - r1 * p2), p1)
        (d, u2, p2, r2, r2 - r1, tu, tf, tv,
          1000000 * (r2 - r1) - tu - tf - tv)
    }.toSet
    val got = Analytics.eventsMetricTree(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSet == expected, "metric tree diverged from the replay")
    assert(got.nonEmpty, "no day pairs — vacuous")
    // conservation with bounded floor dust: 10^6·Δr = Σ terms + dust, dust ∈ {0,1,2}
    got.foreach { r =>
      assert(r._9 >= 0 && r._9 < 3, s"dust out of the 3-floor bound: $r")
      assert(1000000 * r._5 == r._6 + r._7 + r._8 + r._9, "conservation broke")
    }
  }

  test("events_attribution_multi: credits conserve purchase cents exactly per scheme") {
    val rows = Analytics.eventsAttributionMulti(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("decay", "linear"))
    // conservation: every scheme's channel credits sum to the total
    // purchase value — the largest-remainder split loses no cent
    val totalPurchaseCents = graft.sources.Tables.load(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.expr(
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)"))
      .as[Long].collect().head
    for (scheme <- Seq("linear", "decay")) {
      val bys = rows.filter(_._1 == scheme)
      assert(bys.map(_._5).sum == totalPurchaseCents, s"$scheme loses cents")
    }
    // the two schemes must actually disagree somewhere (decay weights
    // later touches more), else the second scheme is vacuous
    val lin = rows.filter(_._1 == "linear").map(r => r._2 -> r._5).toMap
    val dec = rows.filter(_._1 == "decay").map(r => r._2 -> r._5).toMap
    assert(lin.keySet == dec.keySet)
    assert(lin.exists { case (ch, v) => dec(ch) != v },
      "linear and decay identical everywhere — decay face vacuous")
  }

  test("agg_quantile_replay: grid estimate within ±32 cents of the true rank value") {
    val vals = graft.sources.Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.expr("CAST(round(value*100) AS BIGINT)"))
      .as[Long].collect().sorted
    val got = Analytics.aggQuantileReplay(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(250L, 500L, 750L, 900L, 990L))
    got.foreach { case (q, target, n, est, exact, err) =>
      assert(n == vals.length.toLong, s"q$q n")
      assert(target == (q * n + 999) / 1000, s"q$q target rank")
      // the honesty column really is the rank-t order statistic
      assert(exact == vals((target - 1).toInt), s"q$q exact")
      assert(err == est - exact, s"q$q err identity")
      // grid geometry: the estimate is the midpoint of exact's bucket
      assert(est == (exact / 64) * 64 + 32, s"q$q bucket midpoint")
      assert(math.abs(err) <= 32, s"q$q error outside the grid bound")
    }
  }

  test("agg_quantile_union: register-add merge reproduces the direct build exactly") {
    val rows = Analytics.aggQuantileUnion(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.length == 8) // 2 quantiles x 4 faces
    for (q <- Seq(500L, 900L)) {
      val byFace = rows.filter(_._1 == q).map(r => r._2 -> r).toMap
      // mergeability: counting registers add exactly — the merged
      // sketch and the independently built direct sketch must agree
      // on BOTH the total and the estimate
      assert(byFace("merged")._3 == byFace("direct")._3, s"q$q merged n")
      assert(byFace("merged")._5 == byFace("direct")._5, s"q$q merged est")
      assert(byFace("ref")._3 + byFace("cur")._3 == byFace("merged")._3,
        s"q$q window totals don't add")
    }
    // the epochs must be distinguishable somewhere, else the drift
    // face reads nothing (both quantiles identical across windows
    // would make the monitor vacuous at this SF)
    assert(rows.exists(r => {
      val m = rows.filter(x => x._1 == r._1).map(x => x._2 -> x._5).toMap
      m("ref") != m("cur")
    }) || rows.map(_._5).distinct.length > 1,
      "ref and cur estimates identical everywhere — drift face vacuous")
  }

  test("agg_quantile_curve: every width honors its geometry bound; W=64 reproduces the replay face") {
    val rows = Analytics.aggQuantileCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 6) // 3 widths x 2 quantiles
    rows.foreach { case (w, q, target, n, est, exact, err, bound) =>
      assert(bound == w / 2, s"w$w q$q bound")
      assert(err == est - exact, s"w$w q$q err identity")
      // the estimate is the midpoint of exact's bucket at THIS width
      assert(est == (exact / w) * w + w / 2, s"w$w q$q bucket midpoint")
      assert(math.abs(err) <= bound, s"w$w q$q error outside the grid bound")
      assert(target == (q * n + 999) / 1000, s"w$w q$q target rank")
    }
    // the W=64 rows must BE agg_quantile_replay's q500/q900 rows
    val replay = Analytics.aggQuantileReplay(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .filter(r => r._1 == 500L || r._1 == 900L)
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    rows.filter(_._1 == 64L).foreach { case (_, q, target, n, est, exact, err, _) =>
      assert(replay(q) == ((target, n, est, exact, err)),
        s"q$q: curve W=64 row diverges from agg_quantile_replay")
    }
    // exact values agree across widths per quantile (shared honest leg)
    for (q <- Seq(500L, 900L))
      assert(rows.filter(_._2 == q).map(_._6).distinct.length == 1, s"q$q exact leg")
  }

  test("join_asof_forward: next-purchase attribution replayed; censoring and strictness pinned") {
    val rows = Analytics.joinAsofForward(spark, sf)
      .select("event_id", "user_id", "event_type", "us", "next_purchase_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._2)
    byUser.values.foreach { g =>
      val sorted = g.sortBy(r => (r._4, r._1))
      sorted.zipWithIndex.foreach { case ((eid, u, _, us, np), i) =>
        val want = sorted.drop(i + 1).filter(_._3 == "purchase").map(_._4)
          .minOption
        assert(np == want, s"u$u e$eid forward as-of")
      }
    }
    // strictness: a purchase event's own timestamp never matches itself
    rows.filter(_._3 == "purchase").foreach { case (eid, u, _, us, np) =>
      assert(!np.contains(us) ||
        rows.exists(r => r._2 == u && r._3 == "purchase" && r._4 == us && r._1 != eid),
        s"u$u e$eid matched itself")
    }
    // censoring: every user's LAST purchase (and anything after) is NULL
    assert(rows.exists(_._5.isEmpty), "no censored tail — forward face vacuous")
    // "strictly after" is ROW order (us, event_id), not time: a
    // same-microsecond later-event_id purchase may match (>=, not >);
    // the dedicated tie test below pins that case on synthetic data
    assert(rows.forall(r => r._5.forall(_ >= r._4)), "next purchase before the event")
  }

  test("join_asof_forward tie rule: same-microsecond later-event_id purchase matches") {
    import spark.implicits._
    // user 1, all three events at the SAME microsecond us=1000:
    // purchase id0 | click id1 | purchase id2. Row order (us, event_id)
    // makes id2 the "next purchase" for id0 and id1; id2 itself is
    // censored. A time-strict rule would return NULL for all three.
    Seq((0L, 1000L, 1L, "purchase", 1.0),
        (1L, 1000L, 1L, "click", 1.0),
        (2L, 1000L, 1L, "purchase", 2.0))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-asoffwd/events.parquet")
    val got = Analytics.joinAsofForward(spark, "/tmp/graft-test-asoffwd")
      .select("event_id", "next_purchase_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(0L -> Some(1000L), 1L -> Some(1000L), 2L -> None),
      s"tie rule drifted: $got")
  }

  test("pipeline_feature_build: leak-free matrix replayed in memory, encoding fit on train only") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr("unix_micros(ts) div 86400000000"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(round(value*100) AS BIGINT)"))
      .as[(Long, Long, String, Long)].collect()
    val cd = ev.map(_._2).max - 7
    def fold(u: Long): String = {
      val h = s"ftr|$u".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      if (h % 5 == 0) "val" else "train"
    }
    val got = Analytics.pipelineFeatureBuild(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long, String, Long, Long)]
      .collect()
    val byUser = ev.groupBy(_._1)
    // base = exactly the users with pre-cutoff activity
    val wantUsers = byUser.filter(_._2.exists(_._2 < cd)).keySet
    assert(got.map(_._1).toSet == wantUsers, "matrix row set diverges")
    got.foreach { case (u, fl, n7, n28, c28, dsl, stale, mode, enc, label) =>
      val past = byUser(u).filter(_._2 < cd)
      assert(fl == fold(u), s"u$u fold")
      // LEAK-FREE: every feature replays from strictly-pre-cutoff events
      assert(n7 == past.count(_._2 >= cd - 7).toLong, s"u$u f_n7")
      assert(n28 == past.count(_._2 >= cd - 28).toLong, s"u$u f_n28")
      assert(c28 == past.filter(_._2 >= cd - 28).map(_._4).sum, s"u$u f_cents28")
      assert(dsl == cd - past.map(_._2).max, s"u$u recency")
      assert(stale == (if (dsl > 7) 1L else 0L), s"u$u staleness flag")
      val wantMode = past.groupBy(_._3).toSeq
        .map { case (t, xs) => (t, xs.size) }
        .minBy { case (t, n) => (-n, t) }._1
      assert(mode == wantMode, s"u$u mode type")
      // label replays from the horizon side only
      assert(label == (if (byUser(u).exists(e => e._3 == "purchase" && e._2 >= cd)) 1L else 0L),
        s"u$u label")
    }
    // encoding: fit on the train fold only, served to val
    val train = got.filter(_._2 == "train")
    assert(train.nonEmpty && got.exists(_._2 == "val"), "a fold is empty")
    val gppm = 1000000L * train.map(_._10).sum / train.length
    got.foreach { case (u, _, _, _, _, _, _, mode, enc, _) =>
      val t = train.filter(_._8 == mode)
      val want = if (t.isEmpty) gppm
        else (1000000L * t.map(_._10).sum + 20L * gppm) / (t.length + 20L)
      assert(enc == want, s"u$u target encoding not the train-fold fit")
    }
  }

  test("events_watermark_curve: drops replayed per threshold; ties to the 24h face") {
    val rows = Analytics.eventsWatermarkCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 6L, 24L, 72L))
    // replay the planted-disorder arrival in memory
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.expr("unix_micros(ts)"))
      .as[(Long, Long, Long)].collect()
    val lb = ev.groupBy(_._1).values.flatMap { g =>
      var hwm = Long.MinValue
      g.sortBy(_._2).map { case (_, eid, us0) =>
        val us = us0 - (if (eid % 17 == 0) (eid % 5 + 1) * 172800000000L else 0L)
        val l = if (hwm == Long.MinValue) 0L else math.max(hwm - us, 0L)
        hwm = math.max(hwm, us)
        l
      }
    }.toSeq
    rows.foreach { case (w, n, nd, drop, ppm, mx) =>
      assert(n == ev.length.toLong, s"w$w n_events")
      assert(nd == lb.count(_ > 0).toLong, s"w$w n_disordered")
      assert(drop == lb.count(_ > w * 3600000000L).toLong, s"w$w n_dropped")
      assert(ppm == 1000000L * drop / n, s"w$w dropped_ppm")
      assert(mx == lb.max, s"w$w max lateness")
    }
    // widening the watermark can only shed fewer events
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq,
      "drop curve not monotone in the watermark")
    // cross-face tie: the 24h row IS events_late_data's total late count
    val late24 = Analytics.eventsLateData(spark, sf)
      .select("n_late").as[Long].collect().sum
    assert(rows.find(_._1 == 24L).get._4 == late24,
      "24h config diverges from the registered late-data face")
    // the plant guarantees a non-trivial curve
    assert(rows.head._4 > rows.last._4, "curve flat — plant not visible")
  }

  test("agg_countmin_curve: per-width estimates replayed; wider sketches collide less") {
    // sfMid: the narrow w=64 sketch needs enough users to collide
    val ev = graft.sources.Tables.load(spark, sfMid, "events")
      .select("user_id").as[Long].collect()
    val counts = ev.groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
    val lanes = Seq((1103515245L, 12345L), (1140671485L, 12820163L),
      (214013L, 2531011L), (69069L, 1L))
    def cell(i: Int, u: Long, w: Long): Long =
      (u * lanes(i)._1 + lanes(i)._2) % 2147483647L % w
    val got = Analytics.aggCountMinCurve(spark, sfMid)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 20) // 4 widths x 5 hot users
    val widths = Seq(64L, 256L, 1024L, 4096L)
    assert(got.map(_._1).distinct.sorted.toSeq == widths)
    got.foreach { case (w, u, nExact, nEst, err) =>
      assert(nExact == counts(u), s"w$w u$u exact")
      val want = (0 until 4).map { i =>
        val c = cell(i, u, w)
        counts.filter { case (v, _) => cell(i, v, w) == c }.values.sum
      }.min
      assert(nEst == want, s"w$w u$u estimate replay")
      assert(err == nEst - nExact && err >= 0, s"w$w u$u one-sided contract")
    }
    // the ε = e/w law in aggregate: the widest sketch collides no
    // more than the narrowest
    val errOf = got.groupBy(_._1).map { case (w, rs) => w -> rs.map(_._5).sum }
    assert(errOf(4096L) <= errOf(64L), "width curve inverted")
    assert(errOf(64L) > 0, "no collisions at w=64 — curve face vacuous")
  }

  test("events_gini: closed-form Gini replayed in BigInt; top decile dominates uniform") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr("CAST(round(value*100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val got = Analytics.eventsGini(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n, total, gini, top) =>
      val xs = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (u, rows) => (u, rows.map(_._3).sum) }
        .sortBy { case (u, x) => (x, u) }.map(_._2)
      assert(n == xs.length.toLong, s"$t n_users")
      assert(total == xs.sum, s"$t total_cents")
      val a = xs.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val wantGini = (BigInt(2) * a - BigInt(n + 1) * total) * 1000000 /
        (BigInt(n) * total)
      assert(gini == wantGini.toLong, s"$t gini_ppm")
      assert(gini >= 0 && gini < 1000000, s"$t gini out of range")
      val topx = xs.takeRight((n / 10).toInt).map(BigInt(_)).sum
      assert(top == (topx * 1000000 / total).toLong, s"$t top_decile_ppm")
      // the top decile holds at least its uniform share
      assert(top >= (n / 10) * 1000000 / n, s"$t top decile below uniform")
    }
  }

  test("agg_countmin_union: cell-add merge reproduces the direct sketch; replayed in memory") {
    val rows = Analytics.aggCountMinUnion(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 20) // 5 hot users x 4 faces
    val users = rows.map(_._2).distinct
    assert(users.length == 5)
    rows.foreach { case (face, u, nExact, nEst, err) =>
      assert(err == nEst - nExact, s"$face u$u err identity")
      assert(err >= 0, s"$face u$u CMS undercounts — one-sided contract broken")
    }
    for (u <- users) {
      val byFace = rows.filter(_._2 == u).map(r => r._1 -> r).toMap
      // the algebra under test: register-wise ADDITION ≡ direct build
      assert(byFace("merged")._3 == byFace("direct")._3, s"u$u merged n_exact")
      assert(byFace("merged")._4 == byFace("direct")._4, s"u$u merged n_est")
      assert(byFace("ref")._3 + byFace("cur")._3 == byFace("merged")._3,
        s"u$u epoch exact counts don't add")
    }
    // full in-memory replay: per-epoch 4x1024 sketches from the raw rows
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
    val lanes = Seq((1103515245L, 12345L), (1140671485L, 12820163L),
      (214013L, 2531011L), (69069L, 1L))
    def cell(i: Int, u: Long): Int =
      (((u * lanes(i)._1 + lanes(i)._2) % 2147483647L + 2147483647L) % 2147483647L % 1024L).toInt
    val sk = Array.fill(2, 4, 1024)(0L) // epoch (0=ref,1=cur) x lane x cell
    ev.foreach { case (u, ts) =>
      val ep = if (ts.before(cut)) 0 else 1
      for (i <- 0 until 4) sk(ep)(i)(cell(i, u)) += 1L
    }
    rows.foreach { case (face, u, _, nEst, _) =>
      val est = (0 until 4).map { i =>
        val c = cell(i, u)
        face match {
          case "ref" => sk(0)(i)(c)
          case "cur" => sk(1)(i)(c)
          case _     => sk(0)(i)(c) + sk(1)(i)(c) // merged == direct
        }
      }.min
      assert(est == nEst, s"$face u$u in-memory replay diverges")
    }
  }

  test("bucketed-table memo self-heals after an external DROP (fresh-catalog stand-in)") {
    // losing the catalog entries while the JVM-global memo survives is
    // exactly what a SparkSession swap in one JVM produces — the memo
    // must re-create instead of riding into TABLE_NOT_FOUND
    val before = Analytics.joinBucketed(spark, sf).collect()
    val tbls = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_orders_") || n.startsWith("graft_lineitem_"))
    assert(tbls.nonEmpty, "expected bucketed twin tables in the catalog")
    tbls.foreach(t => spark.sql(s"DROP TABLE $t"))
    val after = Analytics.joinBucketed(spark, sf).collect()
    assert(after.map(_.toSeq).toSeq == before.map(_.toSeq).toSeq,
      "re-created bucketed tables changed the result")
  }

  test("bucketed twins carry the v2 column set every consumer needs") {
    Analytics.joinBucketed(spark, sf).collect() // force twin creation
    val names = spark.catalog.listTables().collect().map(_.name)
    val oTbl = names.filter(_.startsWith("graft_orders_"))
    val lTbl = names.filter(_.startsWith("graft_lineitem_"))
    assert(oTbl.nonEmpty && lTbl.nonEmpty, "twins missing from the catalog")
    // v2 additions: q21 filters order status, q9 joins part on the fact
    oTbl.foreach { t =>
      assert(spark.table(t).columns.contains("o_orderstatus"),
        s"orders twin $t missing o_orderstatus")
    }
    lTbl.foreach { t =>
      assert(spark.table(t).columns.contains("l_partkey"),
        s"lineitem twin $t missing l_partkey")
    }
  }

  test("hll union algebra holds its sketch invariants against exact overlaps") {
    import spark.implicits._
    // sf0.001 has ~85 users per pair-union over 64 registers — the raw
    // estimator's biased n~m regime; the driver correctness scale is
    // dense enough (n >> m) for the error bound to be meaningful
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val got = Analytics.aggHllUnion(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 10, "5 event types must yield 10 unordered pairs")
    got.foreach { case (a, b, ea, eb, eu, ei, nx) =>
      assert(a < b, "pairs must be canonically ordered")
      // THEOREM: register-wise max only shrinks the 2^(26-m) terms, so
      // the union estimate dominates each side
      assert(eu >= math.max(ea, eb), s"($a,$b): union estimate below a side")
      // inclusion-exclusion differences three noisy estimates, so its
      // error scales with the UNION magnitude, not the (possibly tiny)
      // intersection: 3 sketches x ~13% (1.04/sqrt(64)) ~ 40% of the
      // union; 50% + floor is non-vacuous (a min-merge bug lands far
      // outside it) without flaking on small overlaps
      assert(math.abs(ei - 1000L * nx) <= (0.5 * eu).toLong.max(2000L),
        s"($a,$b): intersection estimate $ei vs exact ${1000L * nx}, union $eu")
    }
  }

  test("events_props_json matches a regex-extracted model of the JSON blobs") {
    import spark.implicits._
    val rows = graft.sources.Tables.load(spark, sf, "events")
      .select("event_type", "props").as[(String, String)].collect()
    val kOf = """"k"\s*:\s*(-?\d+)""".r
    val ks = rows.map { case (t, p) =>
      (t, kOf.findFirstMatchIn(p).map(_.group(1).toLong))
    }
    val model = ks.groupBy(_._1).map { case (t, v) =>
      val kv = v.flatMap(_._2)
      t -> ((v.length.toLong, kv.length.toLong, kv.sum, kv.min, kv.max))
    }
    val got = Analytics.eventsPropsJson(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == model, s"got $got expected $model")
    // the extraction must be exercised, not vacuously null
    assert(model.values.forall { case (n, nk, _, _, _) => nk == n && n > 0 },
      "every event row must carry a k prop in this corpus")
  }

  test("events_value_histogram buckets partition the corpus exactly") {
    import spark.implicits._
    val cents = graft.sources.Tables.load(spark, sf, "events")
      .select(round(col("value") * 100).cast("long")).as[Long].collect()
    val model = cents.groupBy(_ / 5000).map { case (b, vs) =>
      b -> ((vs.length.toLong, vs.map(BigInt(_)).sum, vs.min, vs.max))
    }
    val got = Analytics.eventsValueHistogram(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet == model.keySet, "bucket key set drifted")
    got.foreach { case (b, n, sum, mn, mx) =>
      val (en, esum, emn, emx) = model(b)
      assert(n == en && sum == (BigDecimal(esum) / 100).toDouble
        && mn == emn / 100.0 && mx == emx / 100.0, s"bucket $b drifted")
      // integer-division bucketing can never misfile a row
      assert(mn >= b * 50.0 && mx < (b + 1) * 50.0, s"bucket $b bounds violated")
    }
    assert(got.map(_._2).sum == cents.length, "buckets must partition all rows")
  }

  test("events_attribution credits the most recent preceding touch, else direct") {
    // user 1: view, click, purchase        -> click (latest touch wins)
    // user 2: purchase with no prior touch -> direct
    // user 3: view, purchase               -> view
    // user 1 again: second purchase after an error (non-touch) keeps click
    val base = 1700000000000000L
    val m = 60L * 1000000
    Seq(
      (1L, 1L, base, "view", 1.0), (1L, 2L, base + m, "click", 2.0),
      (1L, 3L, base + 2 * m, "purchase", 10.0),
      (1L, 4L, base + 3 * m, "error", 0.0),
      (1L, 5L, base + 4 * m, "purchase", 20.0),
      (2L, 6L, base, "purchase", 5.0),
      (3L, 7L, base, "view", 1.0), (3L, 8L, base + m, "purchase", 7.5))
      .toDF("user_id", "event_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-attr/events.parquet")
    val got = Analytics.eventsAttribution(spark, "/tmp/graft-test-attr")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == Set(("click", 2L, 30.0, 1L), ("direct", 1L, 5.0, 1L),
      ("view", 1L, 7.5, 1L)), s"attribution drifted: $got")
  }

  test("events_rfm quintiles match the positional ntile model on real events") {
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("timestamp"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .as[(Long, java.sql.Timestamp, String, Long)].collect()
    val tMax = e.map(_._2.getTime).max
    def days(a: Long, b: Long): Long = { // calendar-day diff, UTC dates
      val d = java.time.temporal.ChronoUnit.DAYS
      d.between(java.time.Instant.ofEpochMilli(a).atZone(java.time.ZoneOffset.UTC).toLocalDate,
        java.time.Instant.ofEpochMilli(b).atZone(java.time.ZoneOffset.UTC).toLocalDate)
    }
    val per = e.groupBy(_._1).map { case (u, es) =>
      (u, days(es.map(_._2.getTime).max, tMax),
        es.count(_._3 == "purchase").toLong,
        es.filter(_._3 == "purchase").map(_._4).sum)
    }.toArray
    // positional ntile: first (n mod 5) buckets get ceil(n/5) rows
    def ntile5[A](sorted: Array[A]): Map[A, Long] = {
      val n = sorted.length; val q = n / 5; val r = n % 5
      sorted.zipWithIndex.map { case (a, i) =>
        val big = (q + 1) * r
        a -> (if (i < big) i / (q + 1) + 1 else (i - big) / q + r + 1).toLong
      }.toMap
    }
    val rModel = ntile5(per.sortBy(p => (-p._2, p._1)).map(_._1))
    val fModel = ntile5(per.sortBy(p => (p._3, p._1)).map(_._1))
    val mModel = ntile5(per.sortBy(p => (p._4, p._1)).map(_._1))
    val got = Analytics.eventsRfm(spark, sf)
      .select("user_id", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length == per.length, "one row per active user")
    got.foreach { case (u, r, f, m, seg) =>
      assert(r == rModel(u) && f == fModel(u) && m == mModel(u),
        s"user $u scores ($r,$f,$m) != model (${rModel(u)},${fModel(u)},${mModel(u)})")
      assert(seg == s"$r$f$m", "segment label must concatenate the scores")
    }
  }

  test("agg_countmin matches an in-memory sketch replay and never undercounts") {
    def poly(str: String): Long =
      str.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    val users = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id").as[Long].collect()
    val grid = Array.ofDim[Long](4, 64)
    users.foreach { u =>
      (0 until 4).foreach(r => grid(r)((poly(s"cm$r|$u") % 64).toInt) += 1)
    }
    val exact = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Analytics.aggCountMin(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == exact.size, "one probe row per distinct user")
    got.foreach { case (u, n, est, over) =>
      val expected = (0 until 4).map(r => grid(r)((poly(s"cm$r|$u") % 64).toInt)).min
      assert(n == exact(u), s"user $u exact count drifted")
      assert(est == expected, s"user $u estimate != sketch replay")
      assert(over == est - n && over >= 0,
        s"user $u violates the CMS no-undercount guarantee")
    }
  }

  test("shared-subtree operators leave no CacheManager entries behind") {
    // r9 ADVICE: operators that materialize a shared subtree must not
    // leak storage across an inventory replay. They now use eager
    // localCheckpoint (RDD blocks freed by ContextCleaner on GC)
    // instead of .cache() (a CacheManager entry no action ever
    // evicts). Pin the mechanism: after running every face that
    // formerly cached, a FRESH build of each must not be intercepted
    // by a lingering InMemoryRelation — the visible face of a leaked
    // CacheManager entry.
    spark.catalog.clearCache()
    Analytics.eventsAnomalyRobust(spark, sf).collect()
    Analytics.eventsCooccurrence(spark, sf).collect()
    Analytics.eventsCooccurrenceDrift(spark, sf).collect()
    graft.operators.Dedup.graphTriangles(spark, sfMid).collect()
    Seq(
      "events_anomaly_robust" -> Analytics.eventsAnomalyRobust(spark, sf),
      "events_cooccurrence" -> Analytics.eventsCooccurrence(spark, sf),
      "events_cooccurrence_drift" -> Analytics.eventsCooccurrenceDrift(spark, sf),
      "graph_triangles" -> graft.operators.Dedup.graphTriangles(spark, sfMid)
    ).foreach { case (name, df) =>
      assert(!df.queryExecution.withCachedData.toString.contains("InMemoryRelation"),
        s"$name left a CacheManager entry behind: a replay plans " +
          "against leaked cached storage")
    }
  }

  test("ml_target_encode matches an in-memory leave-one-out model") {
    val seg = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").as[(Long, String)].collect().toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
      .map { case (ok, ck, tp) => (ok, seg(ck), math.round(tp * 100)) }
    val bySeg = orders.groupBy(_._2).map { case (sg, rows) =>
      sg -> (rows.length.toLong, rows.map(_._3).sum)
    }
    val gMean = orders.map(_._3).sum / orders.length
    val expected = orders.map { case (ok, sg, tc) =>
      val (n, sum) = bySeg(sg)
      (ok, sg, tc, n,
        Math.floorDiv(sum - tc, n - 1),
        Math.floorDiv(sum - tc + 10 * gMean, n - 1 + 10))
    }.toSet
    val got = Analytics.mlTargetEncode(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("events_ab_lift arms partition the users and z is the rooted staged z-square") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").as[(Long, String)].collect()
    val conv = events.groupBy(_._1).map { case (u, es) =>
      u -> (if (es.exists(_._2 == "purchase")) 1L else 0L)
    }
    // the split-family hash: char fold mod 1e9+7 (NOT MinHashKernel's
    // 2^31-1 shingle modulus — parities diverge for multi-digit ids)
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val (as0, bs) = conv.partition { case (u, _) => armOf(u) == 0L }
    val (nA, nB) = (as0.size.toLong, bs.size.toLong)
    val (cA, cB) = (as0.values.sum, bs.values.sum)
    val row = Analytics.eventsAbLift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == nA)
    assert(row._2 == nB)
    assert(row._3 == cA)
    assert(row._4 == cB)
    assert(row._5 == 1000000 * cA / nA)
    assert(row._6 == 1000000 * cB / nB)
    // the staged z-square, replayed from first principles
    val d = cB * nA - cA * nB
    val c = cA + cB; val n = nA + nB
    val z2 = if (c == 0 || c == n) 0L
      else d * d / (nA * nB) * 1000000 * n / (c * (n - c))
    val z = row._8
    assert(z * z <= z2)
    assert((z + 1) * (z + 1) > z2)
  }

  test("events_uplift: per-segment replay, arm totals match the pooled face") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val wkEnd = java.sql.Timestamp.valueOf("2024-01-23 00:00:00")
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val per = events.groupBy(_._1).map { case (u, es) =>
      val pre = es.count(_._2.before(cut)).toLong
      val conv = if (es.exists(e => !e._2.before(cut) && e._2.before(wkEnd) &&
        e._3 == "purchase")) 1L else 0L
      (math.min(pre / 10, 4L), armOf(u), conv)
    }.toSeq
    val expected = per.groupBy(_._1).map { case (seg, us) =>
      val a = us.filter(_._2 == 0L); val b = us.filter(_._2 == 1L)
      val (nA, nB) = (a.size.toLong, b.size.toLong)
      val (cA, cB) = (a.map(_._3).sum, b.map(_._3).sum)
      val rA = if (nA == 0) 0L else 1000000L * cA / nA
      val rB = if (nB == 0) 0L else 1000000L * cB / nB
      seg -> (nA, nB, cA, cB, rA, rB, rB - rA, (rB - rA) * (nA + nB))
    }
    val got = Analytics.eventsUplift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.map(_._1).toSet == expected.keySet, "segment set")
    got.foreach { case (seg, nA, nB, cA, cB, rA, rB, up, incr, z) =>
      val e = expected(seg)
      assert((nA, nB, cA, cB, rA, rB, up, incr) == e, s"segment $seg ledger")
      // the staged z-square, replayed from first principles
      val d = BigInt(cB) * nA - BigInt(cA) * nB
      val c = cA + cB; val n = nA + nB
      val z2 = if (nA == 0 || nB == 0 || c == 0 || c == n) BigInt(0)
        else d * d / (BigInt(nA) * nB) * 1000000 * n / (BigInt(c) * (n - c))
      assert(BigInt(z) * z <= z2 && (BigInt(z) + 1) * (BigInt(z) + 1) > z2,
        s"segment $seg z_milli")
    }
    // segments partition the users: arm totals equal the pooled face
    val pooled = Analytics.eventsAbLift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got.map(_._2).sum == pooled._1 && got.map(_._3).sum == pooled._2,
      "per-segment arm sizes must sum to the pooled experiment's")
  }

  test("events_ab_cuped: BigInt replay and the CUPED conservation identity") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val per = events.groupBy(_._1).map { case (u, es) =>
      val x = BigInt(es.count(_._2.before(cut)))
      val y = BigInt(es.count(e => !e._2.before(cut) && e._3 == "purchase"))
      (armOf(u), x, y)
    }.toSeq
    val n = BigInt(per.size)
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxx = per.map(t => t._2 * t._2).sum
    val syy = per.map(t => t._3 * t._3).sum
    val sxy = per.map(t => t._2 * t._3).sum
    val armA = per.filter(_._1 == 0L); val armB = per.filter(_._1 == 1L)
    val (nA, nB) = (BigInt(armA.size), BigInt(armB.size))
    val (convA, convB) = (armA.map(_._3).sum, armB.map(_._3).sum)
    val (sxA, sxB) = (armA.map(_._2).sum, armB.map(_._2).sum)
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    // floor division replay — every engine-side div runs on a
    // shift-nonnegative numerator, so BigInt / replays it exactly
    def fdiv(p: BigInt, q: BigInt): BigInt = { assert(p >= 0 && q > 0); p / q }
    val TS = BigInt(10).pow(13); val AS = BigInt(10).pow(16)
    val theta =
      if (varx == 0) BigInt(0)
      else fdiv(BigInt(1000000) * cov + TS * varx, varx) - TS
    val rho2 =
      if (varx * vary == 0) BigInt(0)
      else fdiv(BigInt(1000000) * cov * cov, varx * vary)
    assert(rho2 >= 0 && rho2 <= 1000000, "rho^2 outside [0, 1] — not a correlation")
    val adjA = BigInt(1000000) * n * convA - theta * (n * sxA - nA * sx)
    val adjB = BigInt(1000000) * n * convB - theta * (n * sxB - nB * sx)
    // the CUPED conservation identity: Σ(n·x_u − Σx) = 0 over all
    // users, so the pooled ADJUSTED total equals the raw total exactly
    // — adjustment moves mass between arms, never creates it
    assert(adjA + adjB == BigInt(1000000) * n * sy,
      "pooled adjusted total diverged from the raw total")
    val row = Analytics.eventsAbCuped(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(row._1 == n && row._2 == nA && row._3 == nB)
    assert(row._4 == theta, "theta_ppm diverges from the BigInt replay")
    assert(row._5 == rho2, "rho2_ppm diverges from the BigInt replay")
    assert(row._6 == BigInt(1000000) - rho2)
    assert(row._7 == fdiv(BigInt(1000000) * convA, nA))
    assert(row._8 == fdiv(BigInt(1000000) * convB, nB))
    assert(row._9 == row._8 - row._7)
    val aAdj = fdiv(adjA + AS * (n * nA), n * nA) - AS
    val bAdj = fdiv(adjB + AS * (n * nB), n * nB) - AS
    assert(row._10 == aAdj, "adjusted arm-A mean diverges from the replay")
    assert(row._11 == bAdj, "adjusted arm-B mean diverges from the replay")
    assert(row._12 == bAdj - aAdj)
  }

  test("events_ab_sequential: BigInt look replay, OBF floor identity, end-look ties to lift") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val dayOf = (ts: java.sql.Timestamp) => Math.floorDiv(ts.getTime, 86400000L)
    val firsts = events.groupBy(_._1).map { case (u, es) =>
      val fd = es.map(e => dayOf(e._2)).min
      val fp = es.filter(_._3 == "purchase").map(e => dayOf(e._2))
        .reduceOption(_ min _)
      (armOf(u), fd, fp)
    }.toSeq
    val ledgerDays = (firsts.map(_._2) ++ firsts.flatMap(_._3)).distinct.sorted
    val dCount = ledgerDays.size
    val rows = Analytics.eventsAbSequential(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 5)
    // OBF boundary² halves as information accrues — look 1 is strictest
    assert(rows.map(_._9).toSeq == rows.map(_._9).sortBy(-_).toSeq)
    rows.foreach { case (k, day, nA, nB, cA, cB, z2, zMilli, obf2, nv, pc, ob) =>
      val rank = (k * dCount + 4) / 5
      assert(day == ledgerDays(rank.toInt - 1), s"look $k lands on the wrong day")
      // cumulative counters replayed from the per-user firsts
      assert(nA == firsts.count(f => f._1 == 0L && f._2 <= day).toLong)
      assert(nB == firsts.count(f => f._1 == 1L && f._2 <= day).toLong)
      assert(cA == firsts.count(f => f._1 == 0L && f._3.exists(_ <= day)).toLong)
      assert(cB == firsts.count(f => f._1 == 1L && f._3.exists(_ <= day)).toLong)
      // staged z² replay (the events_ab_lift form) in BigInt
      val d = BigInt(cB) * nA - BigInt(cA) * nB
      val c = BigInt(cA + cB); val n = BigInt(nA + nB)
      val z2r = if (nA == 0 || nB == 0 || c == 0 || c == n) BigInt(0)
        else d * d / (BigInt(nA) * nB) * 1000000 * n / (c * (n - c))
      assert(BigInt(z2) == z2r, s"look $k z2_micro diverges from the replay")
      assert(BigInt(zMilli) * zMilli <= z2r && (BigInt(zMilli) + 1) * (BigInt(zMilli) + 1) > z2r)
      // the exact floor identity: z² > (N div k)  ⇔  z²·k > N
      assert(obf2 == 20808000L / k)
      assert((ob == 1L) == (z2 * k > 20808000L), s"look $k OBF verdict diverges")
      assert((nv == 1L) == (zMilli > 1960L))
      assert((pc == 1L) == (zMilli > 2413L))
      // boundary ordering: anything Pocock rejects, the naive peek also
      // rejected (2413 > 1960) — the correction only removes rejections
      if (pc == 1L) assert(nv == 1L)
    }
    // the final look IS the fixed-horizon readout: counters equal
    // events_ab_lift's single row exactly
    val lift = Analytics.eventsAbLift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    val last = rows.last
    assert((last._3, last._4, last._5, last._6) == ((lift._1, lift._2, lift._3, lift._4)),
      "end-look counters diverge from events_ab_lift")
  }

  test("events_did: 2x2 cell replay and the gap identity") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
        col("event_type"))
      .as[(Long, Long, String)].collect()
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val ud = evs.groupBy(e => (e._1, e._2)).map { case ((u, d), es) =>
      (armOf(u), if (d >= 19738L) 1 else 0,
        if (es.exists(_._3 == "purchase")) 1L else 0L)
    }.toSeq
    def cell(a: Long, p: Int) = {
      val hits = ud.filter(t => t._1 == a && t._2 == p)
      (hits.size.toLong, hits.map(_._3).sum)
    }
    val (dap, cap) = cell(0, 0); val (daq, caq) = cell(0, 1)
    val (dbp, cbp) = cell(1, 0); val (dbq, cbq) = cell(1, 1)
    assert(Seq(dap, daq, dbp, dbq).forall(_ > 0), "an empty 2x2 cell — vacuous")
    val row = Analytics.eventsDid(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long,
           Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert((row._1, row._2, row._3, row._4) == ((dap, cap, daq, caq)))
    assert((row._5, row._6, row._7, row._8) == ((dbp, cbp, dbq, cbq)))
    val (rap, raq) = (1000000L * cap / dap, 1000000L * caq / daq)
    val (rbp, rbq) = (1000000L * cbp / dbp, 1000000L * cbq / dbq)
    assert((row._9, row._10, row._11, row._12) == ((rap, raq, rbp, rbq)))
    // the DiD identity: did = post gap - pre gap, all from floored rates
    assert(row._13 == rbp - rap && row._14 == rbq - raq)
    assert(row._15 == (rbq - raq) - (rbp - rap), "DiD identity broke")
  }

  test("events_ab_srm: green on the healthy assignment, fires on a planted skew") {
    val rows = Analytics.eventsAbSrm(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, na, nb, chi, flag) =>
      assert(chi == 1000000L * (na - nb) * (na - nb) / (na + nb),
        "chi2 is not the exact integer form")
      assert(flag == (chi > 3841459L), "flag diverges from the threshold")
      assert(!flag, s"healthy hash assignment flagged SRM ($na vs $nb)")
    }
    // plant a broken assignment: users cherry-picked (by replaying the
    // arm hash) to ALL land in arm 0 — the gate must fire
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val skewUsers = (1L to 1000L).filter(armOf(_) == 0L).take(20)
    assert(skewUsers.length == 20)
    val dir = java.nio.file.Files.createTempDirectory("graft-srm").toString
    try {
      skewUsers.zipWithIndex.map { case (u, i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          u, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Analytics.eventsAbSrm(spark, dir)
        .as[(Long, Long, Long, Long, Boolean)].collect()
      assert(out.length == 1)
      val (_, na, nb, chi, flag) = out.head
      assert(na == 20L && nb == 0L && chi == 1000000L * 400 / 20 && flag,
        s"planted all-arm-0 day did not fire SRM ($na/$nb chi=$chi)")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("join_asof_tolerance: fresh/stale/no-match all exercised, states exact vs the plain as-of") {
    val plain = Analytics.joinAsof(spark, sf)
      .select("event_id", "asof_signup_us").as[(Long, Option[Long])]
      .collect().toMap
    val rows = Analytics.joinAsofTolerance(spark, sf)
      .select("event_id", "us", "asof_us", "gap_us", "stale")
      .as[(Long, Long, Option[Long], Option[Long], Boolean)].collect()
    val TOL = 7L * 86400L * 1000000L
    assert(rows.exists(r => r._3.isDefined), "no fresh matches")
    assert(rows.exists(_._5), "no stale matches — tolerance untested")
    assert(rows.exists(r => r._3.isEmpty && !r._5), "no never-matched rows")
    rows.foreach { case (id, us, asof, gap, stale) =>
      plain(id) match {
        case None =>
          assert(asof.isEmpty && gap.isEmpty && !stale, s"$id: no-match state wrong")
        case Some(raw) if us - raw <= TOL =>
          assert(asof.contains(raw) && gap.contains(us - raw) && !stale,
            s"$id: fresh state wrong")
        case Some(_) =>
          assert(asof.isEmpty && gap.isEmpty && stale, s"$id: stale state wrong")
      }
    }
  }

  test("events_seasonality: weekday fold conserves mass and the deviation is exact") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
      .as[(String, Long)].collect()
    val rows = Analytics.eventsSeasonality(spark, sf)
      .select("event_type", "dow", "n_events", "cents_sum", "dev_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 7))
    // 1970-01-05 was a Monday: epoch day 4 -> dow 0
    assert((4L + 3) % 7 == 0)
    // mass conservation per type
    val byType = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._3).sum == byType(t), s"$t: weekday mass lost")
    }
    // deviation identity replayed from the raw (type, day) counts
    val daily = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val days = daily.keys.filter(_._1 == t).map(_._2).toSeq
      val nDaysByDow = days.groupBy(d => (d + 3) % 7).view.mapValues(_.length.toLong)
      val totalN = byType(t); val totalDays = days.length.toLong
      val mean = totalN / totalDays
      rs.foreach { case (_, dow, n, _, dev) =>
        val nd = nDaysByDow((dow))
        assert(dev == 1000000L * (n / nd - mean) / math.max(mean, 1L),
          s"$t dow $dow: deviation wrong")
      }
    }
  }

  test("events_changepoint: BigInt argmin replay, fires exactly on a planted shift") {
    // full replay of the candidate sweep on the real corpus
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(round(value*100) AS BIGINT)").as("vc"))
      .as[(String, Long, Long)].collect()
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val daily = ev.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val expected = ev.map(_._1).distinct.sorted.map { t =>
      val series = (d0 to d1).map(d => BigInt(daily.getOrElse((t, d), 0L)))
      val n = BigInt(series.length)
      val stot = series.sum; val sstot = series.map(y => y * y).sum
      val flat = (n * sstot - stot * stot) / (n * n)
      var cs = BigInt(0); var css = BigInt(0)
      var bestCost: BigInt = null; var bestDay = 0L
      for (i <- 1 until series.length) {
        cs += series(i - 1); css += series(i - 1) * series(i - 1)
        val iB = BigInt(i); val nr = n - iB
        val a = nr * (iB * css - cs * cs) +
          iB * (nr * (sstot - css) - (stot - cs) * (stot - cs))
        val cost = a / (iB * nr * n)
        // ascending-day iteration + strict < == the (cost, day) order
        if (bestCost == null || cost < bestCost) { bestCost = cost; bestDay = d0 + i - 1 }
      }
      (t, java.time.LocalDate.ofEpochDay(bestDay).toString, flat, bestCost)
    }
    val got = Analytics.eventsChangepoint(spark, sf)
      .select("event_type", "cut_day", "cost_flat", "cost_split")
      .as[(String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expected.length)
    expected.zip(got).foreach { case ((t, day, flat, cost), (gt, gday, gflat, gcost)) =>
      assert(t == gt)
      assert(gday == day, s"$t: argmin day diverges from the replay")
      assert(BigInt(gflat) == flat && BigInt(gcost) == cost,
        s"$t: staged costs diverge from the replay")
    }
    // planted level shift: 10 flat days at 10.00 then 10 at 50.00 —
    // the cut must land exactly on the boundary with zero split cost
    val dir = java.nio.file.Files.createTempDirectory("graft-chg").toString
    try {
      (0 until 20).map { d =>
        (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
          1L, "purchase", if (d < 10) 10.0 else 50.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val row = Analytics.eventsChangepoint(spark, dir)
        .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect()
      assert(row.length == 1)
      val (_, cut, nl, nr, ml, mr, shift, flat, split, gain) = row.head
      assert(cut == "2024-01-10", s"cut landed at $cut, not the planted boundary")
      assert(nl == 10L && nr == 10L)
      assert(ml == 1000L && mr == 5000L && shift == 4000L)
      assert(split == 0L, "perfectly flat halves must cost zero")
      assert(gain == flat && gain > 0L)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("events_cusum equals the sequential max(0,.) recurrence replayed in memory") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(round(value*100) AS BIGINT)").as("vc"))
      .as[(String, Long, Long)].collect()
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val daily = ev.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val expected = ev.map(_._1).distinct.flatMap { t =>
      val series = (d0 to d1).map(d => daily.getOrElse((t, d), 0L))
      val target = series.sum / series.length
      // the TEXTBOOK recurrence — deliberately not the closed form the
      // operator uses, so the identity itself is what's being tested
      var s = 0L
      series.zipWithIndex.map { case (c, i) =>
        s = math.max(0L, s + (c - target))
        (t, java.time.LocalDate.ofEpochDay(d0 + i).toString, c, target,
          c - target, s, s > target)
      }
    }.toSet
    val got = Analytics.eventsCusum(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == expected)
    // non-vacuous: the detector must both rest and fire somewhere
    assert(got.exists(_._7) && got.exists(!_._7),
      "CUSUM never fired (or never rested) — threshold is mis-sized")
  }

  test("ml_lag_features matches an in-memory dense-grid lag model") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(round(value*100) AS BIGINT)").as("vc"))
      .as[(Long, Long, Long)].collect()
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val daily = ev.groupBy(r => (r._1, r._2)).view
      .mapValues(rs => (rs.map(_._3).sum, rs.length.toLong)).toMap
    val expected = ev.map(_._1).distinct.flatMap { u =>
      val series = (d0 to d1).map(d => daily.getOrElse((u, d), (0L, 0L)))
      series.zipWithIndex.map { case ((c, n), i) =>
        val lag1 = if (i >= 1) series(i - 1)._1 else 0L
        val lag7 = if (i >= 7) series(i - 7)._1 else 0L
        val roll7 = series.slice(math.max(0, i - 6), i + 1).map(_._1).sum
        (u, java.time.LocalDate.ofEpochDay(d0 + i).toString, c, n, lag1, lag7, roll7)
      }
    }.toSet
    val got = Analytics.mlLagFeatures(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("join_asof_nearest picks the closest signup, ties to the earlier side") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val signups = ev.filter(_._3 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._4).sorted).toMap
    val got = Analytics.joinAsofNearest(spark, sf)
      .select("event_id", "user_id", "us", "nearest_signup_us", "delta_us")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    got.foreach { case (eid, u, us, nearest, delta) =>
      signups.get(u) match {
        case None =>
          assert(nearest.isEmpty && delta.isEmpty, s"event $eid: no-signup user")
        case Some(ss) =>
          val best = ss.minBy(t => (math.abs(t - us), t))
          assert(nearest.contains(best), s"event $eid: $nearest != $best")
          assert(delta.contains(math.abs(best - us)), s"event $eid delta")
      }
    }
    // non-vacuous: both sides must win somewhere
    val sided = got.flatMap { case (_, u, us, n, _) => n.map(v => (us, v)) }
    assert(sided.exists { case (us, v) => v <= us })
    assert(sided.exists { case (us, v) => v > us })
  }

  test("ml_pit_features: as-of values match an in-memory replay and never leak the future") {
    val cutUs = Seq("2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")
      .map { d =>
        d -> java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli * 1000L
      }
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), expr("CAST(round(value*100) AS BIGINT)").as("vc"))
      .as[(Long, Long, Long, String, Long)].collect()
    val expected = (for {
      (cut, us0) <- cutUs
      ((u, et), rows) <- ev.filter(_._3 < us0).groupBy(r => (r._1, r._4))
    } yield {
      val last = rows.maxBy(r => (r._3, r._2))
      (u, cut, et, rows.length.toLong, last._5, last._3)
    }).toSet
    val got = Analytics.mlPitFeatures(spark, sf)
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(got.toSet == expected)
    // the leakage guard itself: no feature row may see its cutoff
    val cutMap = cutUs.toMap
    got.foreach { r =>
      assert(r._6 < cutMap(r._2), s"feature at ${r._2} leaks a future event")
    }
  }

  test("events_late_data matches an in-memory arrival-order watermark replay") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, id, us0) =>
        // the operator's planted-disorder fixture, replayed here
        (u, id, us0 - (if (id % 17 == 0) (id % 5 + 1) * 172800000000L else 0L))
      }
    val expected = events.groupBy(_._1).map { case (u, es) =>
      var hwm = Long.MinValue
      var late = 0L; var worst = 0L
      es.sortBy(_._2).foreach { case (_, _, us) =>
        if (hwm != Long.MinValue && hwm - us > 86400000000L) {
          late += 1; worst = math.max(worst, hwm - us)
        }
        hwm = math.max(hwm, us)
      }
      (u, es.length.toLong, late, worst)
    }.toSet
    val got = Analytics.eventsLateData(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the plant must make the audit non-vacuous at this sf
    assert(got.exists(_._3 > 0), "no late events — the audit is vacuous")
  }

  test("events_paths top trigrams match a direct per-user recompute") {
    import spark.implicits._
    val got = Analytics.eventsPaths(spark, sf)
      .as[(Long, String, String, String, Long, Long)].collect()
    val evs = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val model = evs.groupBy(_._1).values.flatMap { u =>
      u.sortBy(r => (r._2, r._3)).sliding(3).collect {
        case Array(a, b, c)
          if b._2 - a._2 <= 1800000000L && c._2 - b._2 <= 1800000000L =>
            (a._4, b._4, c._4)
      }
    }.toSeq
    val counts = model.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = model.size.toLong
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20).zipWithIndex
      .map { case (((a, b, c), n), i) =>
        (i + 1L, a, b, c, n, n * 1000000L / total) }
    assert(got.sortBy(_._1).toSeq == expected, "top-20 path list drifted")
    assert(got.nonEmpty && got.map(_._1).toSeq == (1L to got.length).toSeq)
  }

  test("ml_backtest replays the expanding-mean walk per event type") {
    import spark.implicits._
    val got = Analytics.mlBacktest(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val evals = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 =>
          val prior = sorted.take(i).map(_._3)
          val pred = prior.sum / prior.length
          (n - pred, math.abs(n - pred))
      }
      t -> ((evals.length.toLong, evals.map(_._2).sum,
        if (evals.isEmpty) 0L else evals.map(_._2).sum * 1000L / evals.length,
        evals.map(_._1).sum))
    }.filter(_._2._1 > 0)
    assert(got == expected, "backtest ledger drifted")
    assert(got.nonEmpty && got.values.forall(_._1 <= 7))
  }

  test("ml_forecast_seasonal pairs the weekday walk against the flat baseline") {
    import spark.implicits._
    val got = Analytics.mlForecastSeasonal(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val evals = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 &&
            sorted.take(i).exists(p => (p._2 + 3) % 7 == (d + 3) % 7) =>
          val prior = sorted.take(i).map(_._3)
          val priorW = sorted.take(i)
            .filter(p => (p._2 + 3) % 7 == (d + 3) % 7).map(_._3)
          (math.abs(n - prior.sum / prior.length),
            math.abs(n - priorW.sum / priorW.length))
      }
      val nE = evals.length.toLong
      t -> ((nE,
        if (nE == 0) 0L else evals.map(_._1).sum * 1000L / nE,
        if (nE == 0) 0L else evals.map(_._2).sum * 1000L / nE,
        if (nE == 0) 0L
        else evals.map(_._1).sum * 1000L / nE - evals.map(_._2).sum * 1000L / nE))
    }.filter(_._2._1 > 0)
    assert(got == expected, "seasonal backtest ledger drifted")
    // paired walk: both models evaluated on the identical day set
    assert(got.nonEmpty && got.values.forall(_._1 <= 7))
    got.foreach { case (t, (_, flat, seas, gain)) =>
      assert(gain == flat - seas, s"$t gain identity broken")
    }
  }

  test("events_ab_bandit: prequential greedy replay and the regret identities") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(Long, String, Long)].collect()
    val armOf = (u: Long) =>
      ("ab|" + u).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L) % 2
    val byDay = events.groupBy(_._3).toSeq.sortBy(_._1).map { case (d, es) =>
      def stats(arm: Long) = {
        val us = es.filter(e => armOf(e._1) == arm)
        (us.map(_._1).distinct.length.toLong,
          us.filter(_._2 == "purchase").map(_._1).distinct.length.toLong)
      }
      val ((nA, cA), (nB, cB)) = (stats(0L), stats(1L))
      (d, nA, nB, cA, cB)
    }
    var (cumNa, cumNb, cumCa, cumCb, cumRegret) = (0L, 0L, 0L, 0L, 0L)
    val expected = byDay.map { case (d, nA, nB, cA, cB) =>
      val leader = if ((1 + cumCa) * (2 + cumNb) >= (1 + cumCb) * (2 + cumNa)) "a" else "b"
      val rA = if (nA == 0) 0L else 1000000L * cA / nA
      val rB = if (nB == 0) 0L else 1000000L * cB / nB
      val lr = if (leader == "a") rA else rB
      val best = math.max(rA, rB)
      cumRegret += best - lr
      cumNa += nA; cumNb += nB; cumCa += cA; cumCb += cB
      (d, nA, nB, cA, cB, leader, lr, best, best - lr, cumRegret)
    }
    val got = Analytics.eventsAbBandit(spark, sf)
      .as[(Long, Long, Long, Long, Long, String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == expected, "bandit replay drifted")
    // identities: regret nonneg by construction, cumulative monotone
    got.foreach { case (d, _, _, _, _, _, lr, best, reg, _) =>
      assert(reg >= 0L && reg == best - lr, s"day $d regret identity")
    }
    assert(got.map(_._10) == got.map(_._9).scanLeft(0L)(_ + _).tail,
      "cumulative regret must be the running sum")
  }

  test("ml_forecast_reconcile: top-down and bottom-up ledgers replayed from first principles") {
    import spark.implicits._
    val daily0 = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val daily = daily0 ++ daily0.groupBy(_._2).map { case (d, rs) =>
      ("__total", d, rs.map(_._3).sum) }.toSeq
    val lastDay = daily.map(_._2).max
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def holtPm(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = floorDiv(1000L * y + lv + tr, 2)
        tr = floorDiv(lv2 - lv + tr, 2); lv = lv2
      }
      math.max(0L, lv + tr)
    }
    val preds = daily.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 =>
          (t, d, n, holtPm(sorted.take(i).map(_._3)))
      }
    }
    val sums = preds.filter(_._1 != "__total").groupBy(_._2)
      .view.mapValues(_.map(_._4).sum).toMap
    val tops = preds.filter(_._1 == "__total").map(p => p._2 -> ((p._4, p._3))).toMap
    val bLed = preds.filter(_._1 != "__total").groupBy(_._1).map { case (t, rs) =>
      val n = rs.length.toLong
      val aBase = rs.map(r => math.abs(r._3 - r._4 / 1000L)).sum
      val aRec = rs.map { r =>
        val recon = if (sums(r._2) == 0L) r._4 else tops(r._2)._1 * r._4 / sums(r._2)
        math.abs(r._3 - recon / 1000L)
      }.sum
      t -> ((n, aBase * 1000L / n, aRec * 1000L / n,
        aBase * 1000L / n - aRec * 1000L / n))
    }
    val tRows = tops.toSeq.map { case (d, (pm, nTot)) =>
      (math.abs(nTot - pm / 1000L), math.abs(nTot - sums(d) / 1000L)) }
    val tN = tRows.length.toLong
    val tLed = "__total" -> ((tN, tRows.map(_._1).sum * 1000L / tN,
      tRows.map(_._2).sum * 1000L / tN,
      tRows.map(_._1).sum * 1000L / tN - tRows.map(_._2).sum * 1000L / tN))
    val expected = (bLed + tLed).toMap
    val got = Analytics.mlForecastReconcile(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected, "reconciliation ledger drifted from the replay")
    // the gain identity holds on every row
    got.values.foreach { case (_, base, recon, gain) =>
      assert(gain == base - recon, "gain_milli identity")
    }
  }

  test("ml_forecast_trend replays the integer Holt walk, paired with seasonal") {
    import spark.implicits._
    val got = Analytics.mlForecastTrend(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def holtPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = floorDiv(1000L * y + lv + tr, 2)
        tr = floorDiv(lv2 - lv + tr, 2)
        lv = lv2
      }
      floorDiv(lv + tr, 1000)
    }
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val evals = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 &&
            sorted.take(i).exists(p => (p._2 + 3) % 7 == (d + 3) % 7) =>
          val priorW = sorted.take(i)
            .filter(p => (p._2 + 3) % 7 == (d + 3) % 7).map(_._3)
          (math.abs(n - priorW.sum / priorW.length),
            math.abs(n - holtPred(sorted.take(i).map(_._3))))
      }
      val nE = evals.length.toLong
      t -> ((nE,
        if (nE == 0) 0L else evals.map(_._1).sum * 1000L / nE,
        if (nE == 0) 0L else evals.map(_._2).sum * 1000L / nE,
        if (nE == 0) 0L
        else evals.map(_._1).sum * 1000L / nE - evals.map(_._2).sum * 1000L / nE))
    }.filter(_._2._1 > 0)
    assert(got == expected, "trend backtest ledger drifted")
    // the ladder is PAIRED: this key's seasonal column reproduces
    // ml_forecast_seasonal's bit-for-bit (same walk, same day set)
    val seas = Analytics.mlForecastSeasonal(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    got.foreach { case (t, (nE, maeSeas, maeTrend, gain)) =>
      assert(seas(t) == ((nE, maeSeas)), s"$t seasonal column unpaired")
      assert(gain == maeSeas - maeTrend, s"$t gain identity broken")
    }
  }

  test("ml_forecast_damped replays the dyadic damped walk, paired with trend") {
    import spark.implicits._
    val got = Analytics.mlForecastDamped(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def holtPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = fd(1000L * y + lv + tr, 2)
        tr = fd(lv2 - lv + tr, 2); lv = lv2
      }
      fd(lv + tr, 1000)
    }
    def dampedPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val d = fd(tr, 2)
        val lv2 = fd(1000L * y + lv + d, 2)
        tr = fd(lv2 - lv + d, 2); lv = lv2
      }
      fd(lv + fd(tr, 2), 1000)
    }
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val evals = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 &&
            sorted.take(i).exists(p => (p._2 + 3) % 7 == (d + 3) % 7) =>
          (math.abs(n - holtPred(sorted.take(i).map(_._3))),
            math.abs(n - dampedPred(sorted.take(i).map(_._3))))
      }
      val nE = evals.length.toLong
      t -> ((nE,
        if (nE == 0) 0L else evals.map(_._1).sum * 1000L / nE,
        if (nE == 0) 0L else evals.map(_._2).sum * 1000L / nE,
        if (nE == 0) 0L
        else evals.map(_._1).sum * 1000L / nE - evals.map(_._2).sum * 1000L / nE))
    }.filter(_._2._1 > 0)
    assert(got == expected, "damped backtest ledger drifted")
    // the ladder is PAIRED: the trend column reproduces
    // ml_forecast_trend's bit-for-bit (same walk, same day set)
    val trend = Analytics.mlForecastTrend(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    got.foreach { case (t, (nE, maeT, maeD, gain)) =>
      assert(trend(t) == ((nE, maeT)), s"$t trend column unpaired")
      assert(gain == maeT - maeD, s"$t gain identity broken")
    }
  }

  test("ml_forecast_hw replays the seasonal-state walk, paired with trend") {
    import spark.implicits._
    val got = Analytics.mlForecastHw(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def holtPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = fd(1000L * y + lv + tr, 2)
        tr = fd(lv2 - lv + tr, 2); lv = lv2
      }
      fd(lv + tr, 1000)
    }
    // prior as (n, dow) pairs; predDow = the origin day's weekday
    def hwPred(prior: Seq[(Long, Long)], predDow: Long): Long = {
      var lv = 0L; var tr = 0L; var init = false
      val sArr = Array.fill(7)(0L)
      prior.foreach { case (y, w) =>
        if (!init) { lv = 1000L * y; tr = 0L; init = true }
        else {
          val dSeas = sArr(w.toInt)
          val lv2 = fd(1000L * y - dSeas + lv + tr, 2)
          tr = fd(lv2 - lv + tr, 2)
          sArr(w.toInt) = fd(1000L * y - lv2 + dSeas, 2)
          lv = lv2
        }
      }
      fd(lv + tr + sArr(predDow.toInt), 1000)
    }
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val evals = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 7 && i >= 1 &&
            sorted.take(i).exists(p => (p._2 + 3) % 7 == (d + 3) % 7) =>
          val prior = sorted.take(i)
          (math.abs(n - holtPred(prior.map(_._3))),
            math.abs(n - hwPred(prior.map(p => (p._3, (p._2 + 3) % 7)),
              (d + 3) % 7)))
      }
      val nE = evals.length.toLong
      t -> ((nE,
        if (nE == 0) 0L else evals.map(_._1).sum * 1000L / nE,
        if (nE == 0) 0L else evals.map(_._2).sum * 1000L / nE,
        if (nE == 0) 0L
        else evals.map(_._1).sum * 1000L / nE - evals.map(_._2).sum * 1000L / nE))
    }.filter(_._2._1 > 0)
    assert(got == expected, "holt-winters backtest ledger drifted")
    val trend = Analytics.mlForecastTrend(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    got.foreach { case (t, (nE, maeT, maeH, gain)) =>
      assert(trend(t) == ((nE, maeT)), s"$t trend column unpaired")
      assert(gain == maeT - maeH, s"$t gain identity broken")
    }
  }

  test("ml_forecast_select replays champion selection with ladder tie-breaks") {
    import spark.implicits._
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val lastDay = daily.map(_._2).max
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def holtPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = fd(1000L * y + lv + tr, 2); tr = fd(lv2 - lv + tr, 2); lv = lv2
      }
      fd(lv + tr, 1000)
    }
    def dampedPred(prior: Seq[Long]): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val d0 = fd(tr, 2); val lv2 = fd(1000L * y + lv + d0, 2)
        tr = fd(lv2 - lv + d0, 2); lv = lv2
      }
      fd(lv + fd(tr, 2), 1000)
    }
    def hwPred(prior: Seq[(Long, Long)], predDow: Long): Long = {
      var lv = 0L; var tr = 0L; var init = false
      val sArr = Array.fill(7)(0L)
      prior.foreach { case (y, w) =>
        if (!init) { lv = 1000L * y; tr = 0L; init = true }
        else {
          val d0 = sArr(w.toInt); val lv2 = fd(1000L * y - d0 + lv + tr, 2)
          tr = fd(lv2 - lv + tr, 2); sArr(w.toInt) = fd(1000L * y - lv2 + d0, 2)
          lv = lv2
        }
      }
      fd(lv + tr + sArr(predDow.toInt), 1000)
    }
    val expected = daily.groupBy(_._1).flatMap { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val cells = sorted.zipWithIndex.collect {
        case ((_, d, n), i) if d > lastDay - 14 && i >= 1 &&
            sorted.take(i).exists(p => (p._2 + 3) % 7 == (d + 3) % 7) =>
          val prior = sorted.take(i)
          val priorW = prior.filter(p => (p._2 + 3) % 7 == (d + 3) % 7)
          val preds = Seq(
            prior.map(_._3).sum / prior.length,
            priorW.map(_._3).sum / priorW.length,
            holtPred(prior.map(_._3)),
            dampedPred(prior.map(_._3)),
            hwPred(prior.map(p => (p._3, (p._2 + 3) % 7)), (d + 3) % 7))
          (d > lastDay - 7, preds.map(p => math.abs(n - p)))
      }
      val (ev, va) = cells.partition(_._1)
      if (ev.isEmpty || va.isEmpty) None
      else {
        def mae(cs: Seq[(Boolean, Seq[Long])], m: Int): Long =
          cs.map(_._2(m)).sum * 1000L / cs.length
        val names = Seq("flat", "seasonal", "trend", "damped", "hw")
        val vMae = (0 until 5).map(mae(va, _))
        val eMae = (0 until 5).map(mae(ev, _))
        val ch = (0 until 5).minBy(m => (vMae(m), m))
        val bs = (0 until 5).minBy(m => (eMae(m), m))
        Some(t -> ((names(ch), vMae(ch), eMae(ch), names(bs), eMae(bs),
          eMae(ch) - eMae(bs))))
      }
    }
    val got = Analytics.mlForecastSelect(spark, sf)
      .as[(String, String, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expected, s"champion selection drifted: $got vs $expected")
    got.values.foreach { case (_, _, chosenEval, _, bestEval, regret) =>
      assert(regret == chosenEval - bestEval && regret >= 0,
        "regret identity broken — the eval-best must lower-bound the champion")
    }
  }

  test("holt-winters beats plain trend on a weekday-seasonal series") {
    import spark.implicits._
    // 28 flat-level days with a strong weekend double: trend has no
    // seasonal state so it splits the difference; HW learns the
    // weekday offsets and must score a strictly lower MAE
    val counts = (0 until 28).map(d => if ((d + 3) % 7 >= 5) 40L else 10L)
    val rows = for {
      (n, d) <- counts.zipWithIndex; i <- 1L to n
    } yield (d.toLong * 100000 + i, d.toLong * 86400000000L + i * 1000L,
      i % 7 + 1, "season", 1.0)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-hw/events.parquet")
    val Seq((t, nE, maeT, maeH, gain)) =
      Analytics.mlForecastHw(spark, "/tmp/graft-test-hw")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(t == "season" && nE == 7L)
    assert(maeH < maeT,
      s"seasonal state must beat plain trend here: hw $maeH vs trend $maeT")
    assert(gain == maeT - maeH)
  }

  test("damped trend beats plain trend on a crashing series (the damping business case)") {
    import spark.implicits._
    // same crash shape as the floor test: plain Holt extrapolates the
    // collapse slope far below zero; the phi = 1/2 damping halves the
    // trend's reach each step, so damped predictions recover toward
    // the stabilized level and the damped MAE must be strictly lower
    val counts = 2000L +: Seq.fill(13)(1L)
    val rows = for {
      (n, d) <- counts.zipWithIndex; i <- 1L to n
    } yield (d.toLong * 100000 + i, d.toLong * 86400000000L + i * 1000L,
      i % 7 + 1, "crash", 1.0)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-damp/events.parquet")
    val Seq((t, nE, maeT, maeD, gain)) =
      Analytics.mlForecastDamped(spark, "/tmp/graft-test-damp")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(t == "crash" && nE == 7L)
    assert(maeD < maeT,
      s"damping must beat plain trend on the crash: damped $maeD vs trend $maeT")
    assert(gain == maeT - maeD)
  }

  test("trend forecast floors negative Holt state on a crashing series") {
    import spark.implicits._
    // day 0 = 2000 events then 1/day: the level collapses, the trend
    // numerator goes odd-and-negative within three steps, and the
    // level itself goes negative — the regime where floor division
    // (both engines) and truncation toward zero (what DuckDB's bare
    // `//` would do) give different walks. Also exercises the init
    // flag: no state value doubles as the uninitialized sentinel.
    val counts = 2000L +: Seq.fill(13)(1L)
    val rows = for {
      (n, d) <- counts.zipWithIndex; i <- 1L to n
    } yield (d.toLong * 100000 + i, d.toLong * 86400000000L + i * 1000L,
      i % 7 + 1, "crash", 1.0)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-holt/events.parquet")
    def pred(prior: Seq[Long], div: (Long, Long) => Long): Long = {
      var lv = 1000L * prior.head; var tr = 0L
      prior.tail.foreach { y =>
        val lv2 = div(1000L * y + lv + tr, 2)
        tr = div(lv2 - lv + tr, 2)
        lv = lv2
      }
      div(lv + tr, 1000)
    }
    val lastDay = 13L
    val evalDays = (0 to 13).map(_.toLong)
      .filter(d => d > lastDay - 7 && d >= 1 && d - 7 >= 0)
    val floorPreds = evalDays.map(d => pred(counts.take(d.toInt), Math.floorDiv))
    val truncPreds = evalDays.map(d => pred(counts.take(d.toInt), (a, b) => a / b))
    // the guard that this series exercises the distinction at all: a
    // truncating walk must disagree with the floor walk somewhere
    assert(floorPreds != truncPreds,
      "crash series no longer separates floor from truncation — rewrite it")
    val expected = {
      val evals = evalDays.map { d =>
        val priorW = counts.zipWithIndex
          .filter { case (_, pd) => pd < d && (pd + 3) % 7 == (d + 3) % 7 }
          .map(_._1)
        (math.abs(counts(d.toInt) - priorW.sum / priorW.length),
          math.abs(counts(d.toInt) - pred(counts.take(d.toInt), Math.floorDiv)))
      }
      val nE = evals.length.toLong
      val maeS = evals.map(_._1).sum * 1000L / nE
      val maeT = evals.map(_._2).sum * 1000L / nE
      ("crash", nE, maeS, maeT, maeS - maeT)
    }
    val got = Analytics.mlForecastTrend(spark, "/tmp/graft-test-holt")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(expected), s"negative-state Holt walk drifted: $got")
  }

  test("events_mau_wau equals a direct trailing-window recompute") {
    import spark.implicits._
    val got = Analytics.eventsMauWau(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val ud = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .as[(Long, Long)].collect().distinct
    val days = ud.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = ud.filter(r => r._2 >= d - 6 && r._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, dau * 1000000L / wau)
    }
    assert(got.toSeq == expected.toSeq, "active-user series drifted")
    got.foreach { case (d, dau, wau, st) =>
      assert(wau >= dau && st <= 1000000L, s"day $d dau $dau wau $wau")
    }
  }

  test("survival curve censors users the log end cannot observe") {
    import spark.implicits._
    // u1: days 0 and 10 (span 10); u2: day 9 only (span 0, observable
    // for 1 day); u3: day 0 only (span 0, observable 10). logend = 10.
    val userDays = Seq((1L, 0L), (1L, 10L), (2L, 9L), (3L, 0L))
    userDays.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, d * 86400000000L + u * 1000000L, u, "click", 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-surv/events.parquet")
    val out = Analytics.eventsSurvival(spark, "/tmp/graft-test-surv")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // o=0: all 3 at risk, all spans >= 0. o=1: u2 still observable
    // (logend-fd = 1) but its span is 0 — only u1 survives. o>=2: u2 is
    // CENSORED (not counted at risk), so the denominator drops to 2 —
    // the naive uncensored curve would keep dividing by 3.
    val expected = Seq((0L, 3L, 3L, 1000000L), (1L, 3L, 1L, 333333L)) ++
      (2L to 10L).map(o => (o, 2L, 1L, 500000L))
    assert(out == expected, s"survival drifted: $out")
  }

  test("cohort LTV accumulates exact cents and ignores non-purchase value") {
    import spark.implicits._
    // u1,u2 cohort day0 (u2 never purchases); u3 cohort day1.
    val rows = Seq(
      (1L, 0L, 1L, "purchase", 5.0), (2L, 0L, 2L, "view", 99.0),
      (3L, 2L, 1L, "purchase", 2.5), (4L, 1L, 3L, "purchase", 1.0))
    rows.map { case (e, d, u, t, v) => (e, d * 86400000000L + e * 1000L, u, t, v) }
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-ltv/events.parquet")
    val out = Analytics.eventsCohortLtv(spark, "/tmp/graft-test-ltv")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("1970-01-01", 0L, 2L, 500L, 500L, 250L),
      ("1970-01-01", 2L, 2L, 250L, 750L, 375L),
      ("1970-01-02", 0L, 1L, 100L, 100L, 100L)), s"ltv drifted: $out")
  }

  test("conformal interval covers at the nominal rate when residuals are calibrated") {
    import spark.implicits._
    // 21 days each: "click" constant 10/day; "view" constant 10 with a
    // one-day spike of 25 inside the eval week (day 18).
    val rows = for {
      d <- 0L to 20L; t <- Seq("click", "view")
      n = if (t == "view" && d == 18L) 25 else 10
      i <- 1 to n
    } yield (d * 1000 + i.toLong, d, t)
    rows.zipWithIndex.map { case ((e, d, t), i) =>
      (i.toLong, d * 86400000000L + e * 1000L, e % 7 + 1, t, 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-conf/events.parquet")
    val out = Analytics.mlForecastInterval(spark, "/tmp/graft-test-conf")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // calibration = days 1..13 (day 0 has no prior) -> n_cal 13, rank
    // ceil(0.9*14) = 13 -> q90 = the max calibration residual = 0.
    // click: all eval residuals 0 -> full coverage. view: the day-18
    // spike misses the band (|25-10| > 0), later days re-absorb it
    // (floor mean stays 10) -> 6/7 covered.
    assert(out == Seq(
      ("click", 13L, 0L, 7L, 7L, 1000000L),
      ("view", 13L, 0L, 7L, 6L, 857142L)), s"conformal drifted: $out")
  }

  test("a/b power replays the two-proportion formula exactly") {
    import spark.implicits._
    // 4 (user, day) units; "buy" converts 1 of 4 (p = 0.25), "view"
    // 3 of 4 (p = 0.75) — same p(1-p), different deltas.
    val rows = Seq((1L, 0L, "buy"), (1L, 1L, "view"),
      (2L, 0L, "view"), (2L, 1L, "view"))
    rows.zipWithIndex.map { case ((u, d, t), i) =>
      (i.toLong, d * 86400000000L + i * 1000L, u, t, 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-pow/events.parquet")
    val out = Analytics.eventsAbPower(spark, "/tmp/graft-test-pow")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    def n(pPpm: Long, mde: Long): Long = {
      val delta = pPpm * mde / 100
      val num = BigInt(1568) * pPpm * (1000000L - pPpm)
      val den = BigInt(100) * delta * delta
      ((num + den - 1) / den).toLong
    }
    val expected = for {
      (t, p) <- Seq(("buy", 250000L), ("view", 750000L))
      m <- Seq(5L, 10L, 20L)
    } yield (t, 4L, p, m, p * m / 100, n(p, m))
    assert(out == expected, s"power table drifted: $out")
    // more sensitivity demanded -> more samples, always
    out.groupBy(_._1).values.foreach { g =>
      val byMde = g.sortBy(_._4).map(_._6)
      assert(byMde == byMde.sorted.reverse, "n_per_arm not monotone in MDE")
    }
  }

  test("funnel time picks the exact rank-quantile latencies per stage pair") {
    import spark.implicits._
    // u1: view@0 click@10s purchase@60s; u2: view@0 click@20s;
    // u3: view@0 click@30s -> view_click latencies {10,20,30}
    val rows = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 60L, "purchase"),
      (2L, 0L, "view"), (2L, 20L, "click"),
      (3L, 0L, "view"), (3L, 30L, "click"))
    rows.zipWithIndex.map { case ((u, sec, t), i) =>
      (i.toLong, sec * 1000000L + u, u, t, 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-ft/events.parquet")
    val out = Analytics.eventsFunnelTime(spark, "/tmp/graft-test-ft")
      .as[(String, Long, Long, Long)].collect().toSeq
    // n=3: p50 rank (3+1)/2=2 -> 20s, p90 rank (27+9)/10=3 -> 30s
    assert(out == Seq(
      ("click_purchase", 1L, 50L, 50L),
      ("view_click", 3L, 20L, 30L),
      ("view_purchase", 1L, 60L, 60L)), s"funnel time drifted: $out")
  }

  test("gap histogram buckets by binary digits and flags the session cut") {
    import spark.implicits._
    // one user, gaps of 5 s, 100 s, 3895 s -> buckets 2, 6, 11; only
    // the last exceeds the 1800 s session cut
    val secs = Seq(0L, 5L, 105L, 4000L)
    secs.zipWithIndex.map { case (sec, i) =>
      (i.toLong, sec * 1000000L, 1L, "click", 1.0)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/graft-test-gap/events.parquet")
    val out = Analytics.eventsGapHistogram(spark, "/tmp/graft-test-gap")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (2L, 3L, 1L, 0L, 333333L, 333333L),
      (6L, 63L, 1L, 0L, 333333L, 666666L),
      (11L, 2047L, 1L, 1L, 333333L, 1000000L)), s"gap histogram drifted: $out")
  }

  test("markov steady state equals a 6-round in-memory mass replay") {
    import spark.implicits._
    val got = Analytics.eventsMarkovSteady(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    // replay from the registered one-step matrix
    val m = Analytics.eventsMarkov(spark, sf)
      .select("from_type", "to_type", "n").as[(String, String, Long)]
      .collect()
    val rt = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val states = (m.map(_._1) ++ m.map(_._2)).distinct.sorted
    var pi = states.map(t => t -> 1000000000000L / states.length).toMap
    for (_ <- 1 to 6) {
      val inflow = m.groupBy(_._2).view.mapValues(
        _.map { case (f, _, n) => (BigInt(pi(f)) * n / rt(f)).toLong }.sum).toMap
      pi = states.map(t => t -> inflow.getOrElse(t, 0L)).toMap
    }
    val expected = states.map(t => (t, pi(t), pi(t) / 1000000L)).toSeq
    assert(got == expected, s"steady state drifted: $got vs $expected")
    // mass is conserved up to integer-division dust (never created)
    assert(got.map(_._2).sum <= 1000000000000L)
    assert(got.map(_._2).sum > 990000000000L, "mass evaporated beyond dust")
  }
}
