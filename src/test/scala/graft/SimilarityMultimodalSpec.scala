package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

class SimilarityMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("bruteforce ANN: ranks are 1..k per query, cosine non-increasing") {
    val out = Similarity.annBruteforce(spark, sf)
      .select("query_id", "rank", "cosine").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong))
      val cos = sorted.map(_._3)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b - 1e-12 })
    }
  }

  test("bruteforce ANN top-1 matches a manual argmax for query 0") {
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val q = vecs(0L)
    val manual = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.head._1
    val sparkTop = Similarity.annBruteforce(spark, sf)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").as[Long].head()
    assert(sparkTop == manual)
  }

  test("LSH ANN returns only same-bucket candidates and valid ranks") {
    val out = Similarity.annLsh(spark, sf)
      .select("query_id", "rank", "cosine").as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, r, c) => r >= 1L && r <= 5L && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
  }

  test("IVF ANN produces valid ranked neighbors with decent recall vs brute force") {
    val ivf = Similarity.annIvf(spark, sf)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).values.foreach { rows =>
      assert(rows.sortBy(_._3).map(_._3).toSeq == (1L to rows.length.toLong))
    }
    val bf = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val hits = ivf.map(r => (r._1, r._2)).count(bf.contains)
    val recall = hits.toDouble / bf.size
    info(s"IVF recall@5 vs brute force: $recall")
    // trained 32-cell codebook, assign-2, probe-3 measures 0.94 here
    // (graft.DebugIvf); 0.85 leaves slack for testdata regeneration
    assert(recall >= 0.85, s"IVF recall@5 regressed below trained baseline: $recall")
  }

  test("IVFPQ composition: exact cosines on the pool, recall at least IVF's pool floor") {
    val out = Similarity.annIvfPq(spark, sf)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    // ranks dense per query, cosines non-increasing in rank
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to rows.length.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, "cosine must fall with rank")
        case _ =>
      }
    }
    // the REPORTED cosine is the exact one: recompute brute-force
    // cosine for every returned pair and require bit-equality —
    // the rerank leg must not leak the ADC approximation
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    out.foreach { case (q, nb, c, _) =>
      assert(math.abs(cos(e(q), e(nb)) - c) < 1e-9,
        s"query $q neighbor $nb: reported cosine is not the exact cosine")
    }
    // recall@5 vs brute force: the ADC pool (40 of the ~94 probed
    // candidates, 16-centroid subspace codebooks) keeps recall near
    // the IVF face's (measured 0.90 here vs IVF's 0.94; 0.8 leaves
    // regeneration slack)
    val bf = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = out.map(r => (r._1, r._2)).count(bf.contains).toDouble / bf.size
    info(s"IVFPQ recall@5 vs brute force: $recall")
    assert(recall >= 0.8, s"IVFPQ recall@5 regressed: $recall")
  }

  test("ann_ood flags the bottom-1% rank cut; a planted junk vector pages first") {
    // corpus properties: exactly ceil(N/100) rows, dense ranks, cosine
    // non-decreasing with rank
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val rows = Similarity.annOod(spark, sf)
      .select("vec_id", "cos_micro", "ood_rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(rows.length.toLong == (n + 99) / 100, "rank cut size drifted")
    assert(rows.map(_._3).toSeq == (1L to rows.length.toLong))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2, "cosine must rise with rank")
      case _ =>
    }
    // planted fixture: 32 one-hot seeds, 68 normals clustered on the
    // first 8 seed directions, and ONE junk vector pointing equally at
    // everything — the audit must page the junk first
    val dim = 64
    def oneHot(i: Int): Array[Float] = {
      val v = new Array[Float](dim); v(i) = 1.0f; v
    }
    val seeds = (0 until 32).map(i => (i.toLong, oneHot(i), i))
    val normals = (32 until 100).map(i => (i.toLong, oneHot(i % 8), i % 8))
    val junk = Seq((100L, Array.fill(dim)(1.0f / 8.0f), 99))
    val dir = java.nio.file.Files.createTempDirectory("graft-ood").toString
    try {
      (seeds ++ normals ++ junk).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.annOod(spark, dir)
        .select("vec_id", "cos_micro", "ood_rank")
        .as[(Long, Long, Long)].collect().sortBy(_._3)
      assert(out.length == 2, s"ceil(101/100) = 2 flagged, got ${out.length}")
      assert(out.head._1 == 100L, "the planted junk vector must page first")
      assert(out.head._2 < out(1)._2,
        "junk must sit strictly below the in-distribution tail")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("dq_embedding_drift: exact codebook replay, conservation, TVD identity") {
    val got = Similarity.dqEmbeddingDrift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // in-memory replay against the shared trained codebook
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val cb = Similarity.trainedCodebook(spark, sf)
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    val best = e.map { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      val (bc, _) = cb.map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .minBy { case (cid, cos) => (-cos, cid) }
      (id % 2, bc)
    }
    val cells = best.map(_._2).distinct.sorted
    val tr = best.count(_._1 == 0L).toLong
    val tc = best.count(_._1 == 1L).toLong
    val expected = cells.map { c =>
      val nr = best.count(b => b._1 == 0L && b._2 == c).toLong
      val nc = best.count(b => b._1 == 1L && b._2 == c).toLong
      (c, nr, nc, 1000000L * nr / tr, 1000000L * nc / tc)
    }
    val tvd = expected.map(x => math.abs(x._4 - x._5)).sum / 2
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == expected.toSet,
      "occupancy ledger diverged from the codebook replay")
    got.foreach { r =>
      assert(r._6 == math.abs(r._4 - r._5), "delta column inconsistent")
      assert(r._7 == tvd, "tvd column inconsistent")
    }
    assert(got.map(_._2).sum == tr && got.map(_._3).sum == tc,
      "halves must conserve the corpus")
  }

  test("ann_recall_eval scores every face against an independent truth join") {
    val rows = Similarity.annRecallEval(spark, sf)
      .select("face", "query_id", "n_hits", "n_returned", "recall_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set("graph", "ivf", "ivf_pq", "lsh"))
    // arithmetic invariants
    rows.foreach { case (f, q, h, r, ppm) =>
      assert(h <= r && r <= 5, s"$f/$q: hits/returned out of range")
      assert(ppm == 1000000L * h / 5, s"$f/$q: ppm not the exact ratio")
    }
    // the scores must equal an independent in-memory join of the faces
    val truth = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def score(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ps) =>
          q -> ps.count(truth.contains).toLong }
    val expect = Map(
      "graph" -> score(Similarity.annGraphSearch(spark, sf)),
      "ivf" -> score(Similarity.annIvf(spark, sf)),
      "ivf_pq" -> score(Similarity.annIvfPq(spark, sf)),
      "lsh" -> score(Similarity.annLsh(spark, sf)))
    rows.foreach { case (f, q, h, _, _) =>
      assert(expect(f).getOrElse(q, 0L) == h, s"$f/$q: hit count diverges")
    }
    // the eval reproduces the spec floors the faces already carry
    def meanRecall(f: String) = {
      val fr = rows.filter(_._1 == f)
      fr.map(_._3).sum.toDouble / (5.0 * fr.length)
    }
    assert(meanRecall("ivf") >= 0.85 && meanRecall("ivf_pq") >= 0.8)
    // the graph face's business case: beam search seeded from ONE
    // probe cell must recover recall at-or-above the ivf_pq floor —
    // i.e. the graph walk buys back what the cheaper seeding gave up.
    info(s"graph-face mean recall: ${meanRecall("graph")}")
    assert(meanRecall("graph") >= 0.8,
      s"graph-face recall regressed: ${meanRecall("graph")}")
  }

  test("cell-bucketed embedding dedup is an exact-subset with high recall") {
    import graft.operators.Dedup
    val ivf = Similarity.dedupEmbeddingIvf(spark, sf)
      .select("vec_a", "vec_b", "cosine").as[(Long, Long, Double)].collect()
    val exact = Dedup.dedupEmbedding(spark, sf)
      .select("vec_a", "vec_b", "cosine").as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    assert(exact.nonEmpty, "expected planted embedding near-dup pairs")
    // PRECISION is structural (the exact cosine verify sits in the
    // join): every reported pair must be a true pair with the same
    // cosine the exact face computes.
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (a, b, c) =>
      assert(a < b && exactCos.get((a, b)).contains(c),
        s"($a,$b,$c) not in / differing from the exact pair set")
    }
    // RECALL is the approximation under test: a pair is missed only
    // when both members land in disjoint assign-2 cell sets. Planted
    // near-dups (cosine >= 0.45 on 64-dim noise) are near-parallel, so
    // their top-cells almost always overlap; 0.9 leaves slack for
    // testdata regeneration.
    val recall = ivf.map(r => (r._1, r._2)).count(exactPairs.contains)
      .toDouble / exactPairs.size
    info(s"cell-bucketed dedup recall vs exact: $recall")
    assert(recall >= 0.9, s"cell-bucketed dedup recall regressed: $recall")
  }

  test("PQ ANN equals a single-threaded replay of train + encode + ADC") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    def l2(a: Array[Float], b: Array[Float]): Double =
      dotd(a, a) - 2 * dotd(a, b) + dotd(b, b)
    val half = 32
    def sub(v: Array[Float], i: Int): Array[Float] =
      java.util.Arrays.copyOfRange(v, i * half, (i + 1) * half)
    // train: per-subspace 4-centroid L2 k-means, 2 rounds, micro-int means
    val books = (0 until 2).map { sx =>
      var cents = emb.filter(_._1 < 4).map { case (id, v) => (id, sub(v, sx)) }
      for (_ <- 1 to 2) {
        val assign = emb.map { case (_, v) =>
          val sv = sub(v, sx)
          val best = cents.map { case (cid, cv) => (l2(sv, cv), cid) }.min._2
          (best, sv.map(x => math.round(x * 1e6)))
        }
        val agg = assign.groupBy(_._1).map { case (cid, rows) =>
          cid -> (rows.map(_._2).transpose.map(_.sum).toArray, rows.length)
        }
        cents = cents.map { case (cid, old) =>
          agg.get(cid) match {
            case Some((sums, cnt)) => (cid, sums.map(x => (x.toDouble / 1e6 / cnt).toFloat))
            case None => (cid, old)
          }
        }
      }
      cents.toMap
    }
    val enc = emb.map { case (id, v) =>
      id -> (0 until 2).map { sx =>
        books(sx).toSeq.sortBy(_._1).map { case (cid, cv) => (l2(sub(v, sx), cv), cid) }.min._2
      }
    }.toMap
    val model = emb.filter(_._1 < 10).flatMap { case (q, qv) =>
      val lut = (0 until 2).map(sx => books(sx).map { case (cid, cv) => cid -> l2(sub(qv, sx), cv) })
      emb.filter(_._1 != q).map { case (v, _) =>
        (q, v, lut(0)(enc(v)(0)) + lut(1)(enc(v)(1)))
      }.sortBy { case (_, v, d) => (d, v) }.take(5).zipWithIndex
        .map { case ((qq, v, d), i) => (qq, i + 1L) -> ((v, d)) }
    }.toMap
    val got = Similarity.annPq(spark, sf)
      .select("query_id", "rank", "neighbor_id", "adist")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1L to rows.length.toLong))
    }
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap == model,
      "PQ pipeline drifted from the single-threaded replay")
  }

  test("cdc chunks reassemble blobs exactly and boundaries are shift-tolerant") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").as[String].collect()
    texts.foreach { t =>
      val cs = graft.functions.CdcKernel.chunkArray(t.getBytes("UTF-8"))
      val lens = cs.map(_ & 1048575L)
      // chunks tile the blob exactly
      assert(lens.sum == t.getBytes("UTF-8").length.toLong, "chunk lengths must tile the blob")
      // every packed hash is mod-P and lengths positive
      assert(cs.forall(d => (d >> 20) < 2147483647L && (d & 1048575L) > 0))
    }
    // shift tolerance: prepending bytes re-aligns within a window — the
    // tail chunks of the shifted blob match the original's tail chunks
    val t = texts.maxBy(_.length)
    val orig = graft.functions.CdcKernel.chunkArray(t.getBytes("UTF-8"))
    val shifted = graft.functions.CdcKernel.chunkArray(("zq! " + t).getBytes("UTF-8"))
    assume(orig.length >= 4, "need a multi-chunk blob to observe re-alignment")
    val sharedTail = orig.reverse.zip(shifted.reverse).takeWhile { case (a, b) => a == b }.length
    assert(sharedTail >= orig.length - 2,
      s"CDC must re-align after an edit: only $sharedTail of ${orig.length} tail chunks survived a 4-byte prepend")
  }

  test("mm_cdc_chunks accounting matches a direct kernel replay") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").as[String].collect()
    val refs = texts.flatMap(t => graft.functions.CdcKernel.chunkArray(t.getBytes("UTF-8")))
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
      .filter(_._2 >= 2)
    val model = refs.map { case (d, n) =>
      (d >> 20, d & 1048575L) -> ((n, (n - 1) * (d & 1048575L)))
    }
    val got = Multimodal.mmCdcChunks(spark, sf)
      .select("chunk_hash", "chunk_len", "n_refs", "bytes_saved")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "corpus must produce duplicated chunks (non-vacuous)")
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap == model,
      "chunk accounting drifted from the kernel replay")
  }

  test("ann_cell_balance: postings replayed against the shared codebook, mass conserved") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val cb = graft.operators.Similarity.trainedCodebook(spark, sf)
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    val model = emb.flatMap { case (_, v) =>
      val n = math.sqrt(dotd(v, v))
      cb.map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(2).map(_._1)
    }.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val got = graft.operators.Similarity.annCellBalance(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(g => g._1 -> g._2).toMap == model,
      "posting counts diverge from the shared-codebook replay")
    // redundant indexing conserves mass exactly: ASSIGN postings/vector
    assert(got.map(_._2).sum == 2L * emb.length, "posting mass != 2N")
    val tot = got.map(_._2).sum; val nc = got.length.toLong
    got.foreach { case (c, n, share, dev, hot) =>
      assert(share == 1000000L * n / tot, s"cell $c share")
      assert(dev == share - 1000000L / nc, s"cell $c dev")
      assert(hot == (if (n * nc > 2 * tot) 1L else 0L), s"cell $c flag")
    }
    // the trained quantizer balances this corpus: deviations straddle 0
    assert(got.exists(_._4 > 0) && got.exists(_._4 < 0))
  }

  test("mm_silence_chunks: runs replayed in memory, alternate, and tile every frame") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter { case (id, t) => id % 3 == 1 && t.length >= 32 }
    val got = Multimodal.mmSilenceChunks(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length == docs.length, "blob set diverges")
    docs.foreach { case (id, t) =>
      val nf = t.length / 32
      val energy = (0 until nf).map(f =>
        t.substring(f * 32, f * 32 + 32).map(_.toLong).sum)
      val tot = energy.sum
      val quiet = energy.map(e => if (e * nf < tot) 1L else 0L)
      // fold into runs
      val runs = quiet.zipWithIndex.foldLeft(List.empty[(Long, Int, Int)]) {
        case (acc, (q, f)) => acc match {
          case (q0, s0, _) :: tail if q0 == q => (q0, s0, f) :: tail
          case _ => (q, f, f) :: acc
        }
      }.reverse
      val rows = got.filter(_._1 == id).sortBy(_._2)
      assert(rows.length == runs.length, s"doc $id run count")
      rows.zip(runs).zipWithIndex.foreach { case (((_, rid, q, st, en, n, e), (mq, ms, me)), i) =>
        assert(rid == i.toLong, s"doc $id run ids not dense")
        assert(q == mq && st == ms.toLong && en == me.toLong, s"doc $id run $i span")
        assert(n == (me - ms + 1).toLong, s"doc $id run $i width")
        assert(e == (ms to me).map(energy(_)).sum, s"doc $id run $i energy")
      }
      // alternation + tiling: that's what makes them RUNS
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"doc $id consecutive runs share a state")
          assert(b._4 == a._5 + 1, s"doc $id runs don't tile")
        case _ =>
      }
    }
    // non-vacuous: both states appear somewhere
    assert(got.exists(_._3 == 1L) && got.exists(_._3 == 0L))
  }

  test("mm_cdc_dedup: first-writer-pays conserves the global store; bill replayed in memory") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2.nonEmpty)
    val kinds = Seq("image", "audio", "video")
    val refs = docs.flatMap { case (id, t) =>
      graft.functions.CdcKernel.chunkArray(t.getBytes("UTF-8"))
        .map(d => (id, kinds((id % 3).toInt), d >> 20, d & 1048575L))
    }
    val got = Multimodal.mmCdcDedup(spark, sf)
      .select("kind", "n_blobs", "n_chunk_refs", "raw_bytes",
        "n_chunks_owned", "stored_bytes", "bytes_saved", "stored_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 3)
    // conservation: per-kind stored bytes sum to the global distinct store
    val globalStore = refs.groupBy(r => (r._3, r._4)).map(_._2.head._4).sum
    assert(got.map(_._6).sum == globalStore, "stored bytes != global store size")
    // raw bytes tile the blobs exactly (chunks partition each blob)
    assert(got.map(_._4).sum == docs.map(_._2.getBytes("UTF-8").length.toLong).sum,
      "raw bytes != corpus byte mass")
    // full in-memory replay of the per-kind bill
    val owners = refs.groupBy(r => (r._3, r._4))
      .map { case (_, v) => v.minBy(_._1) } // first writer
    got.foreach { case (kind, nb, nr, raw, owned, stored, saved, ppm) =>
      val kr = refs.filter(_._2 == kind)
      val ko = owners.filter(_._2 == kind)
      assert(nb == kr.map(_._1).distinct.length.toLong, s"$kind n_blobs")
      assert(nr == kr.length.toLong, s"$kind n_chunk_refs")
      assert(raw == kr.map(_._4).sum, s"$kind raw_bytes")
      assert(owned == ko.size.toLong, s"$kind n_chunks_owned")
      assert(stored == ko.map(_._4).sum, s"$kind stored_bytes")
      assert(saved == raw - stored && saved >= 0, s"$kind saved")
      assert(ppm == 1000000L * stored / raw, s"$kind stored_ppm")
    }
  }

  test("mm ingest kinds cycle by doc_id and sha256 is 64 hex chars") {
    val out = Multimodal.mmIngest(spark, sf)
      .select("doc_id", "kind", "sha256").as[(Long, String, String)].collect()
    assert(out.forall { case (id, kind, sha) =>
      val expect = Seq("image", "audio", "video")((id % 3).toInt)
      kind == expect && sha.matches("[0-9a-f]{64}")
    })
  }

  test("mm blob inventory: one row per distinct blob, dup accounting exact") {
    // sf0.1 is the one corpus with real byte-identical copies (8);
    // smaller SFs exercise the all-unique path.
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling")
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val groups = texts.groupBy(_._2).values
      .map(g => (g.map(_._1).min, g.size.toLong, g.head._2.length.toLong)).toSeq
    val got = graft.operators.Multimodal.mmDedupBlob(spark, dir)
      .select("canon_id", "n_copies", "byte_len", "bytes_saved")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == groups.size, "one row per distinct blob")
    val want = groups.map { case (c, n, l) => c -> ((n, l, (n - 1) * l)) }.toMap
    got.foreach { case (c, n, l, saved) =>
      assert(want(c) == ((n, l, saved)), s"canonical $c accounting")
    }
    assert(got.count(_._2 > 1) > 0, "sf0.1 must surface its real duplicate groups")
  }

  test("mm_resize: aspect-preserving fit into 224 with no upscale") {
    val rows = Multimodal.mmResize(spark, sf)
      .select("doc_id", "w", "h", "out_w", "out_h", "scale_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, ow, oh, sp) =>
      assert(id % 3 == 0, "only image-kind blobs are resized")
      // the scale is exactly the integer fit rule
      assert(sp == math.min(1000000L, math.min(224000000L / w, 224000000L / h)),
        s"doc $id: scale_ppm wrong")
      assert(ow == w * sp / 1000000L && oh == h * sp / 1000000L,
        s"doc $id: output dims not the floored scale")
      assert(ow <= 224 && oh <= 224, s"doc $id: exceeded the model box")
      assert(sp <= 1000000L, s"doc $id: upscaled")
      // aspect preserved within one floor step
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.05,
        s"doc $id: aspect drifted")
    }
    // the rule actually downsizes something on this corpus
    assert(rows.exists(_._6 < 1000000L), "no blob exercised the downscale path")
  }

  test("mm batch extract: features match a direct recompute") {
    val out = Multimodal.mmBatchExtract(spark, sf)
      .select("doc_id", "byte_len", "head_byte", "tail_byte", "checksum")
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    texts.take(20).foreach { case (id, txt) =>
      val bytes = txt.getBytes("UTF-8")
      val (bl, hb, tb, cs) = out(id)
      assert(bl == bytes.length && hb == (bytes.head & 0xff) && tb == (bytes.last & 0xff))
      assert(cs == bytes.foldLeft(0L)((acc, x) => (acc * 31 + (x & 0xff)) % 997))
    }
  }

  test("columnar decode operator equals the typed mapPartitions twin and plans columnar") {
    val colr = Multimodal.mmBatchExtract(spark, sf)
    val typed = Multimodal.mmBatchExtractTyped(spark, sf)
    val a = colr.collect().map(_.toSeq)
    val b = typed.collect().map(_.toSeq)
    assert(a.length == b.length && a.indices.forall(i => a(i) == b(i)),
      "columnar decode diverged from the typed twin")
    val plan = colr.queryExecution.executedPlan.toString
    assert(plan.contains("MmDecode"), s"expected MmDecodeExec in plan:\n$plan")
    assert(plan.contains("ColumnarToRow"),
      s"expected a columnar transition above the decode:\n$plan")
  }

  test("ivf curve: cost falls with cells, yield rises with assign, production point consistent") {
    import spark.implicits._
    val curve = Similarity.dedupEmbeddingIvfCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, k, cand, pairs) => (c, k) -> ((cand, pairs)) }.toMap
    assert(curve.keySet == Set((8L, 1L), (8L, 2L), (16L, 1L), (16L, 2L), (32L, 1L), (32L, 2L)))
    curve.foreach { case ((c, k), (cand, pairs)) =>
      assert(pairs <= cand, s"($c,$k): more verified pairs than candidates") }
    // more cells ⇒ smaller buckets ⇒ fewer candidate comparisons
    Seq(1L, 2L).foreach { k =>
      assert(curve((8L, k))._1 > curve((16L, k))._1 &&
        curve((16L, k))._1 > curve((32L, k))._1,
        s"candidate cost not monotone in cells at assign=$k") }
    // redundant assignment can only widen the candidate set ⇒ yield
    // (and cost) never drop when assign grows
    Seq(8L, 16L, 32L).foreach { c =>
      assert(curve((c, 2L))._2 >= curve((c, 1L))._2 &&
        curve((c, 2L))._1 >= curve((c, 1L))._1,
        s"assign=2 lost pairs or candidates at cells=$c") }
    // the curve's production point reports exactly the registered
    // dedup_embedding_ivf pair count (same codebook, same verify)
    val prod = Similarity.dedupEmbeddingIvf(spark, sf).count()
    assert(curve((32L, 2L))._2 == prod,
      s"curve (32,2) = ${curve((32L, 2L))._2} but production face found $prod")
  }

  test("ivf index memo self-heals after an external DROP (fresh-catalog stand-in)") {
    val before = Similarity.annIvfIndexed(spark, sf).collect()
    val tbls = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_ivf_"))
    assert(tbls.nonEmpty, "expected persisted IVF index tables in the catalog")
    tbls.foreach(t => spark.sql(s"DROP TABLE $t"))
    val after = Similarity.annIvfIndexed(spark, sf).collect()
    assert(after.map(_.toSeq).toSeq == before.map(_.toSeq).toSeq,
      "re-created IVF index changed the search result")
  }

  test("ann_index_upsert: assign-2 mass conserved, ledger exact, flags match the ratio") {
    val rows = Similarity.annIndexUpsert(spark, sf)
      .select("cell", "n_base", "n_new", "n_total", "growth_ppm", "retrain_flag")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // every vector indexed in exactly ASSIGN=2 cells: total mass 2N,
    // new mass = 2 * the modular 20% batch
    assert(rows.map(_._4).sum == 2 * nVecs, "assign-2 index mass lost")
    assert(rows.map(_._3).sum == 2 * (0L until nVecs).count(_ % 5 == 4),
      "arriving-batch mass wrong")
    rows.foreach { case (c, b, n, t, g, f) =>
      assert(t == b + n, s"cell $c: total != base+new")
      assert(g == 1000000L * n / math.max(b, 1L), s"cell $c: growth_ppm wrong")
      assert(f == (g > 500000L), s"cell $c: flag diverges from threshold")
    }
    // the healthy corpus has SOME growth everywhere but most cells
    // under the 2x-ratio flag (the batch is an iid 20% slice)
    assert(rows.count(_._6) < rows.length / 2,
      "an iid batch should not flag most cells")
  }

  test("mm_phash/mm_dedup_phash: 60-bit sigs; pair face is exact vs the signature brute force") {
    val sigs = Multimodal.mmPhash(spark, sfMid).as[(Long, Long)].collect()
    assert(sigs.nonEmpty)
    assert(sigs.forall { case (_, p) => p >= 0L && p < (1L << 60) },
      "phash escaped the 60-bit range")
    // all-pairs truth over the collected signature relation (tiny at
    // spec SF): every emitted pair must be a true <=10 pair with the
    // exact Hamming (precision 1.0 by construction -- banding only
    // prunes, the verify filter is exact)
    val brute = (for {
      (ia, pa) <- sigs; (ib, pb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 10
    } yield (ia, ib, h)).toSet
    val pairs = Multimodal.mmDedupPhash(spark, sfMid)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.nonEmpty, "pair face vacuous at spec SF")
    assert(pairs.forall(brute.contains),
      "pair face emitted a non-pair or a wrong Hamming")
    // pigeonhole: below 4 differing bits a clean band is guaranteed,
    // so banding MUST recover every such pair
    val guaranteed = brute.filter(_._3 < 4)
    assert(guaranteed.subsetOf(pairs),
      "banding lost a pair inside the pigeonhole-lossless range")
  }

  test("mm_audio_chunks: 30s windows on a 20s hop tile every stream exactly") {
    import spark.implicits._
    val rows = Multimodal.mmAudioChunks(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._4)
      val (rate, n) = (sorted.head._2, sorted.head._3)
      assert(Set(8000L, 12000L, 16000L).contains(rate), s"doc $id rate")
      // indices are dense from 0; starts advance by exactly one hop
      sorted.zipWithIndex.foreach { case ((_, _, _, idx, st, en, ms), i) =>
        assert(idx == i, s"doc $id chunk index gap")
        assert(st == idx * rate * 20, s"doc $id start off-hop")
        assert(en == math.min(st + rate * 30, n), s"doc $id end")
        assert(en > st, s"doc $id empty chunk")
        assert(ms == st * 1000 / rate, s"doc $id start_ms")
      }
      // the plan covers the stream end and never plans past it
      assert(sorted.last._6 == n, s"doc $id tail uncovered")
      assert(sorted.last._5 < n, s"doc $id chunk planned past the end")
      assert(sorted.length == (n - 1) / (rate * 20) + 1, s"doc $id chunk count")
    }
  }

  test("mm_scene_cut: full corpus replay, planted repeated-frame boundary is exact") {
    val vids = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id", "text").as[(Long, String)].collect()
    def sigOf(text: String, f: Int): Int =
      (0 until 16).map { j =>
        if (text(f * 32 + 2 * j) > text(f * 32 + 2 * j + 1)) 1 << j else 0
      }.sum
    val expected = vids.flatMap { case (id, text) =>
      val nf = text.length / 32
      if (nf < 1) Seq.empty
      else {
        val sigs = (0 until nf).map(sigOf(text, _))
        val cuts = (0 until nf).map { f =>
          if (f > 0 && Integer.bitCount(sigs(f) ^ sigs(f - 1)) >= 12) 1 else 0
        }
        val sceneIds = cuts.scanLeft(0)(_ + _).tail
        (0 until nf).groupBy(sceneIds(_)).toSeq.map { case (sc, fs) =>
          val cutDist = fs.sorted.headOption.filter(_ > 0)
            .filter(f => cuts(f) == 1)
            .map(f => Integer.bitCount(sigs(f) ^ sigs(f - 1)).toLong)
          (id, sc.toLong, fs.min.toLong, fs.max.toLong, fs.size.toLong, cutDist)
        }
      }
    }.toSet
    val got = Multimodal.mmSceneCut(spark, sf)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(got == expected, "scene ledger diverges from the in-memory replay")
    assert(got.nonEmpty && got.exists(_._6.isDefined),
      "no cut ever fired — threshold vacuous on this corpus")
    // planted scenes: 5 identical all-ones-signature frames, then 5
    // all-zeros frames — one cut, exactly at the boundary, distance 16
    val dir = java.nio.file.Files.createTempDirectory("graft-scene").toString
    try {
      val text = ("ba" * 16) * 5 + ("ab" * 16) * 5
      Seq((2L, text)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Multimodal.mmSceneCut(spark, dir)
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
        .sortBy(_._2).toSeq
      assert(rows == Seq(
        (2L, 0L, 0L, 4L, 5L, None),
        (2L, 1L, 5L, 9L, 5L, Some(16L))),
        s"planted boundary mis-segmented: $rows")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("ann_graph_upsert: delta-maintained graph equals the full rebuild edge-for-edge") {
    import spark.implicits._
    // the planted batch is the ingest split itself (vec_id % 5 = 4):
    // fold it into the persisted base artifact, then compare against
    // the from-scratch rebuild over the whole corpus
    val up = Similarity.annGraphUpsertEdges(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val rebuilt = Similarity.annKnnGraph(spark, sf)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(up == rebuilt,
      s"upsert-only: ${up.diff(rebuilt).take(5)}; rebuild-only: ${rebuilt.diff(up).take(5)}")
    // ledger identities + non-vacuity
    val led = Similarity.annGraphUpsert(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nb, nn, naff, nk, na, nd, nne, dig) = led
    val baseSrcEdges = up.count(_._1 % 5 != 4).toLong
    assert(nk + na == baseSrcEdges, "kept + added must tile the base-src edges")
    assert(nne == up.count(_._1 % 5 == 4).toLong, "new-edge count wrong")
    assert(nb == up.map(_._1).count(_ % 5 != 4).toLong, "base node count")
    assert(nn == up.map(_._1).count(_ % 5 == 4).toLong, "new node count")
    assert(naff <= nb && naff > 0, "no affected nodes — upsert spec vacuous")
    assert(na > 0 && nd > 0, "batch must displace some base edges")
    assert(nn > 0 && nne >= nn, "every new node carries edges")
    val expectDig = rebuilt.toSeq
      .map { case (s, d, r) => ((s * 131071L + d) * (r + 1L)) % 1000000007L }.sum
    assert(dig == expectDig, "digest must cover the rebuilt edge set exactly")
  }

  test("ann_knn_graph agrees with ann_ivf on the shared query set") {
    val graph = Similarity.annKnnGraph(spark, sf)
    val small = graph.filter(col("query_id") < 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(small == ivf,
      "knn graph restricted to the ivf query set must equal ann_ivf")
    // every vector is a query node with a dense 1..m rank prefix
    val byQ = graph.select("query_id", "rank").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(byQ.size == nVecs, s"graph covers ${byQ.size} of $nVecs vectors")
    byQ.foreach { case (q, rs) =>
      assert(rs == (1L to rs.length), s"query $q ranks not dense: $rs")
      assert(rs.length <= 5, s"query $q has ${rs.length} neighbors")
    }
  }

  test("corpus_semdedup ledger replays the min-id drop rule over the pair face") {
    val pairs = Similarity.dedupEmbeddingIvf(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val dropped = pairs.map(_._2).toSet
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect()
    val expected = labels.groupBy(_._2).map { case (l, rs) =>
      val nd = rs.count(r => dropped(r._1)).toLong
      val n = rs.length.toLong
      l -> ((n, nd, n - nd, (n - nd) * 1000000L / n))
    }
    val got = Similarity.corpusSemdedup(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected, "semdedup ledger drifted from the pair face")
    assert(got.values.map(_._1).sum == labels.length.toLong)
    assert(got.values.map(_._2).sum == dropped.size.toLong,
      "every dropped vector must appear in exactly one label bucket")
  }

  test("ann_recall_curve is monotone and its probe-3 row ties to ann_recall_eval") {
    val curve = Similarity.annRecallCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // cost and yield both monotone in the probe dial
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"candidates fell ${a._1}->${b._1}")
      assert(a._4 <= b._4, s"hits fell ${a._1}->${b._1}")
    }
    curve.foreach { case (p, nc, nr, nh, ppm) =>
      assert(nr <= 50 && nh <= nr, s"probe $p returned $nr hits $nh")
      assert(ppm == nh * 1000000L / 50L, s"probe $p ppm $ppm")
      assert(nc >= nr, s"probe $p candidates $nc < returned $nr")
    }
    // the production probe-3 setting must reproduce ann_recall_eval's ivf row
    val evalHits = Similarity.annRecallEval(spark, sf)
      .filter(col("face") === "ivf")
      .agg(sum(col("n_hits"))).as[Long].collect().head
    assert(curve.find(_._1 == 3L).get._4 == evalHits,
      "probe-3 hits drifted from ann_recall_eval's ivf face")
  }

  test("ann_probe_plan picks the cheapest reached config, degrades honestly") {
    val curve = Similarity.annRecallCurve(spark, sf)
      .select("nprobe", "n_candidates", "recall_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq(700000L, 800000L, 900000L, 950000L).map { t =>
      val reached = curve.filter(_._3 >= t)
      val pick =
        if (reached.nonEmpty) reached.minBy(_._1)
        else curve.maxBy(c => (c._3, -c._1))
      (t, pick._1, pick._3, pick._2, if (pick._3 >= t) 1L else 0L)
    }
    val got = Similarity.annProbePlan(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, "probe plan drifted from the curve replay")
    // the SLO dial is monotone: a harder target never picks a cheaper
    // probe count (among reached targets)
    val reachedRows = got.filter(_._5 == 1L)
    reachedRows.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._2, "harder target picked fewer probes")
      case _ =>
    }
  }

  test("ann_beam_plan picks the cheapest reached beam, degrades honestly") {
    val curve = Similarity.annGraphRecallCurve(spark, sf)
      .select("beam", "n_candidates", "recall_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq(700000L, 800000L, 900000L, 950000L).map { t =>
      val reached = curve.filter(_._3 >= t)
      val pick =
        if (reached.nonEmpty) reached.minBy(_._1)
        else curve.maxBy(c => (c._3, -c._1))
      (t, pick._1, pick._3, pick._2, if (pick._3 >= t) 1L else 0L)
    }
    val got = Similarity.annBeamPlan(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, "beam plan drifted from the curve replay")
    // degraded targets (reached = 0) must carry the curve's BEST recall
    // with the cheapest beam achieving it — the honest top-out answer
    val best = curve.maxBy(c => (c._3, -c._1))
    got.filter(_._5 == 0L).foreach { r =>
      assert(r._2 == best._1 && r._3 == best._3,
        s"degraded target ${r._1} must fall to the best row, got $r")
      assert(r._3 < r._1, "a degraded row claiming to meet its target")
    }
    // the SLO dial is monotone among reached targets, and the beam dial
    // buys recall with candidates: n_candidates is monotone in beam
    val reachedRows = got.filter(_._5 == 1L)
    reachedRows.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._2, "harder target picked a cheaper beam")
      case _ =>
    }
    curve.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._2, "visited-set cost shrank as beam grew")
      case _ =>
    }
  }

  test("ann_cells_curve: cost falls with cells, faces consistent, full top-k") {
    val curve = Similarity.annCellsCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(curve.map(_._1) == Seq(8L, 16L, 32L), "curve domain is the cells sweep")
    // every leg returns the full top-k and a sane recall
    curve.foreach { case (c, nc, nr, nh, rp) =>
      assert(nr == 50L, s"cells=$c returned $nr of 50")
      assert(nh <= nr && rp == 1000000L * nh / 50L, s"cells=$c recall arithmetic")
      assert(nc >= nr, s"cells=$c fewer candidates than returns")
    }
    // the dial's defining property: candidate cost falls as cells grow
    curve.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 > b._2,
        s"candidates must fall with cells (${a._1}:${a._2} -> ${b._1}:${b._2})")
      case _ =>
    }
    // face consistency at the default dial: the 32-cell leg IS annIvf's
    // config, so its recall equals annIvf ∩ brute-truth directly
    val ivf = Similarity.annIvf(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val hits = ivf.count(truth.contains)
    val row32 = curve.find(_._1 == 32L).get
    assert(row32._4 == hits.toLong,
      s"32-cell curve hits ${row32._4} != annIvf∩truth $hits")
  }

  test("ann_cells_plan picks the cheapest reached cell count, degrades honestly") {
    val curve = Similarity.annCellsCurve(spark, sf)
      .select("cells", "n_candidates", "recall_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq(700000L, 800000L, 900000L, 950000L).map { t =>
      val reached = curve.filter(_._3 >= t)
      val pick =
        if (reached.nonEmpty) reached.minBy(c => (c._2, c._1))
        else curve.maxBy(c => (c._3, -c._2, -c._1))
      (t, pick._1, pick._3, pick._2, if (pick._3 >= t) 1L else 0L)
    }
    val got = Similarity.annCellsPlan(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, "cells plan drifted from the curve replay")
    // the dial is cost-ranked: a harder target never picks a CHEAPER
    // candidate volume (among reached targets)
    val reachedRows = got.filter(_._5 == 1L)
    reachedRows.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._4,
        "harder target picked a cheaper candidate volume")
      case _ =>
    }
  }

  test("ann_filtered_search pre-filters: every neighbor satisfies the predicate") {
    val got = Similarity.annFilteredSearch(spark, sf)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (q, nb, _) =>
      assert(labels(nb) % 2 == 0, s"query $q returned odd-label neighbor $nb")
    }
    // pre-filter vs post-filter: the filtered face must NOT equal the
    // unfiltered top-k with odd labels discarded — post-filtering
    // under-fills k (that is the defect this face exists to avoid);
    // per query the filtered list is >= as long as the discarded one
    val unfiltered = Similarity.annIvf(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val post = unfiltered.filter(r => labels(r._2) % 2 == 0)
      .groupBy(_._1).view.mapValues(_.length).toMap
    val pre = got.groupBy(_._1).view.mapValues(_.length).toMap
    pre.foreach { case (q, n) =>
      assert(n >= post.getOrElse(q, 0), s"query $q: pre-filter $n < post-filter")
    }
    assert(pre.values.sum > post.values.sum,
      "predicate never binds — pre vs post filtering indistinguishable")
  }

  test("hard negatives are near-misses, never near-duplicates") {
    import spark.implicits._
    val hn = Similarity.annHardNegatives(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(hn.nonEmpty, "no hard negatives mined")
    // the defining cut: every mined negative is below the near-dup
    // threshold, and none collides with a verified near-dup pair
    assert(hn.forall(_._3 < 0.45))
    hn.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq,
        s"query $q ranks not dense")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted.reverse,
        s"query $q cosines not non-increasing")
    }
    // consistency with the search face: an annIvf neighbor below the
    // near-dup cut is also a hard negative at an equal-or-better rank
    val ivf = Similarity.annIvf(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    val hnRank = hn.map(r => (r._1, r._2) -> r._4).toMap
    ivf.filter(_._3 < 0.45).foreach { case (q, nbr, _, rk) =>
      assert(hnRank.get((q, nbr)).exists(_ <= rk),
        s"ivf non-dup neighbor ($q,$nbr) missing or demoted")
    }
  }

  test("pipeline_media_build: marginal stage identity, faces consistent") {
    import spark.implicits._
    val led = Multimodal.pipelineMediaBuild(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(led.map(_._1).toSeq == Seq("audio", "image", "video"))
    // the marginal accounting identity: every ingested blob is either
    // dropped by exactly one stage or admitted
    led.foreach { case (k, ing, blob, phash, adm, raw, _, stored, saved, ppm) =>
      assert(ing == blob + phash + adm, s"$k stage identity broken")
      assert(saved == raw - stored, s"$k bytes_saved identity broken")
      assert(ppm >= 0 && ppm <= 1000000L, s"$k stored_ppm out of range")
    }
    // stage-1 consistency: ingest counts match the registered face
    val ingFace = Multimodal.mmIngest(spark, sf)
      .groupBy(col("kind")).agg(count(lit(1)))
      .as[(String, Long)].collect().toMap
    led.foreach { case (k, ing, _, _, _, _, _, _, _, _) =>
      assert(ingFace(k) == ing, s"$k ingest count drifted from mm_ingest")
    }
    // stage-3 consistency: phash drops never exceed the face's
    // distinct higher-id endpoints
    val faceDrops = Multimodal.mmDedupPhash(spark, sf)
      .select(col("doc_b")).distinct().count()
    assert(led.map(_._3).sum <= faceDrops,
      "phash stage dropped more than the pair face's endpoints")
    // global storage conservation: dedup never inflates the store
    assert(led.map(_._7).sum <= led.map(_._6).sum,
      "stored bytes exceed raw bytes globally")
  }

  test("ann_graph_search replays a driver-side beam walk; cheaper than probe-3") {
    import spark.implicits._
    val out = Similarity.annGraphSearch(spark, sf)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    // dense 1..5 ranks per query, all ten queries answered
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"query $q ranks not dense")
    }
    // independent replay: same codebook, plain-Scala beam recurrence
    // (sequential-fold doubles = FloatVectorDot's association order)
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0; while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }; d
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    def cos(a: Long, b: Long): Double = dot(vecs(a), vecs(b)) / (nrm(a) * nrm(b))
    val cb = Similarity.trainedCodebook(spark, sf)
    def cells(id: Long, k: Int): Seq[Long] =
      cb.map { case (cid, cv, cn) => (cid, dot(vecs(id), cv) / (nrm(id) * cn)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k).map(_._1).toSeq
    val assign = vecs.keys.toSeq.flatMap(id => cells(id, 2).map(c => c -> id))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edges = Similarity.annKnnGraph(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var graphCost = 0L; var ivfCost = 0L
    (0L until 10L).foreach { q =>
      var visited = cells(q, 1).flatMap(assign.getOrElse(_, Set.empty[Long])).toSet - q
      for (_ <- 1 to 2) {
        val beam = visited.toSeq.sortBy(id => (-cos(q, id), id)).take(8)
        visited = visited ++ beam.flatMap(b => edges.getOrElse(b, Seq.empty)).filter(_ != q)
      }
      graphCost += visited.size
      val expect = visited.toSeq.sortBy(id => (-cos(q, id), id)).take(5)
        .zipWithIndex.map { case (id, i) => (q, id, i + 1L) }
      assert(out.filter(_._1 == q).sortBy(_._3).toSeq == expect,
        s"query $q top-5 diverges from the replayed walk")
      ivfCost += cells(q, 3).flatMap(assign.getOrElse(_, Set.empty[Long]))
        .toSet.excl(q).size
    }
    // the headline claim: strictly fewer scored candidates than probe-3
    info(s"graph candidate cost $graphCost vs probe-3 ivf $ivfCost")
    assert(graphCost < ivfCost, s"graph walk ($graphCost) not cheaper than probe-3 ($ivfCost)")
    // recall floor, read off the registered eval face
    val eval = Similarity.annRecallEval(spark, sf)
      .filter(col("face") === "graph")
      .agg(sum("n_hits"), sum("n_returned")).as[(Long, Long)].head()
    info(s"graph recall: ${eval._1}/50")
    assert(eval._2 == 50L)
    assert(eval._1 >= 40L, s"graph recall@5 regressed: ${eval._1}/50")
  }

  test("ann_graph_recall_curve: cost monotone in beam, recall saturates, face-consistent") {
    val rows = Similarity.annGraphRecallCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L))
    rows.foreach { case (b, cand, ret, hits, ppm) =>
      assert(ret == 50L, s"beam $b must return NQ*K rows")
      assert(hits <= ret && ppm == 1000000L * hits / 50L, s"beam $b arithmetic")
      assert(cand >= ret, s"beam $b scored fewer candidates than it returned")
    }
    // the dial's shape: widening the beam can only visit MORE (cost
    // strictly monotone — each round keeps a superset of the narrower
    // beam's frontier on this corpus) and recall never degrades
    val cands = rows.map(_._2); val hits = rows.map(_._4)
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      s"visited-set cost must grow with beam: ${cands.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall must not degrade with beam: ${hits.toSeq}")
    // the beam-8 leg IS the registered search face: its hit count must
    // equal ann_recall_eval's graph-face sum (itself truth-checked)
    val evalHits = Similarity.annRecallEval(spark, sf)
      .filter(col("face") === "graph")
      .agg(sum("n_hits")).as[Long].head()
    assert(rows.last._4 == evalHits,
      s"beam-8 leg diverges from the recall-eval graph face: ${rows.last._4} vs $evalHits")
  }

  test("pipeline_media_incremental: planted fixture exercises every drop class") {
    // 60 blocks x 10 chars; block j "high" iff bit j of the pattern is
    // set. With exactly 30 high blocks the global mean sits midway, so
    // the phash equals the pattern bit-for-bit; pairwise pattern
    // Hamming >= 30 keeps distinct docs out of the <= 10 cut.
    def blockText(pattern: Long): String =
      (0 until 60).map(j =>
        if ((pattern >> j & 1L) == 1L) "qrstuvwxyz" else "abcdefghij").mkString
    // same block sums => same phash; different bytes => different sha
    def swapped(t: String): String =
      "" + t.charAt(1) + t.charAt(0) + t.substring(2)
    val patA = (0 until 30).map(1L << _).sum            // bits 0..29
    val patB = (30 until 60).map(1L << _).sum           // bits 30..59
    val patC = (0 until 60 by 2).map(1L << _).sum       // even bits
    val patD = (1 until 60 by 2).map(1L << _).sum       // odd bits
    val patE = ((0 until 15) ++ (30 until 45)).map(1L << _).sum
    val ta = blockText(patA); val tb = blockText(patB); val tc = blockText(patC)
    val td = blockText(patD); val te = blockText(patE)
    val docs = Seq(
      (0L, ta, "src0"),           // standing
      (3L, tb, "src0"),           // standing
      (6L, ta, "src1"),           // blob_dup: sha matches standing doc 0
      (9L, tc, "src1"),           // within-batch CAS canonical -> admitted
      (12L, tc, "src1"),          // blob_dup: within-batch copy of doc 9
      (15L, swapped(tb), "src1"), // phash_dup vs standing doc 3 (hamming 0)
      (18L, td, "src1"),          // within-batch phash pair low id -> admitted
      (21L, swapped(td), "src1"), // phash_dup within batch (higher id)
      (24L, te, "src1"))          // admitted
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet("/tmp/graft-test-mmi/documents.parquet")
    val got = Multimodal.pipelineMediaIncremental(spark, "/tmp/graft-test-mmi")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // all planted delta ids are % 3 == 0 -> one 'image' ledger row
    assert(got == Seq(("image", 7L, 2L, 2L, 3L, 1000000L * 3 / 7)),
      s"incremental media ledger drifted: $got")
  }

  test("pipeline_media_incremental: marginal identity holds on the corpus") {
    val rows = Multimodal.pipelineMediaIncremental(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, arr, bd, pd, adm, ppm) =>
      assert(arr == bd + pd + adm, s"$k: marginal identity broken")
      assert(ppm == 1000000L * adm / arr, s"$k: ppm not the exact ratio")
    }
    // n_arrived per kind is exactly the src1 slice of the ingest face
    val want = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("source") === "src1")
      .select(element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))
      .groupBy(col("kind")).count()
      .as[(String, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == want, "arrival counts diverge")
  }

  test("spark.graft.ann.cells: default ⇒ bit-identical 32-cell plan; dial threads through") {
    // default (conf unset) resolves to the committed 32-cell codebook,
    // bit-for-bit — every oracle pin and CORRECTNESS row is unchanged
    assert(spark.conf.getOption(Similarity.AnnCellsKey).isEmpty)
    def same(a: Array[(Long, Array[Float], Double)],
        b: Array[(Long, Array[Float], Double)]): Boolean =
      a.length == b.length && a.zip(b).forall { case ((ia, va, na), (ib, vb, nb)) =>
        ia == ib && java.util.Arrays.equals(va, vb) && na == nb
      }
    val byDefault = Similarity.trainedCodebook(spark, sf)
    val explicit32 = Similarity.trainedCodebook(spark, sf, 32)
    assert(byDefault.length == 32, "default dial must stay 32 cells")
    assert(same(byDefault, explicit32), "default-conf codebook drifted off cells=32")
    val ivfDefault = Similarity.annIvf(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSeq
    try {
      // the dial threads end-to-end: cells=8 retrains (≡ explicit 8)
      // and the search face still returns a full valid top-k per query
      spark.conf.set(Similarity.AnnCellsKey, "8")
      assert(same(Similarity.trainedCodebook(spark, sf),
        Similarity.trainedCodebook(spark, sf, 8)), "conf dial not honored")
      val ivf8 = Similarity.annIvf(spark, sf)
        .as[(Long, Long, Double, Long)].collect().toSeq
      val perQ = ivf8.groupBy(_._1)
      assert(perQ.keySet == (0L until 10L).toSet, "cells=8 lost queries")
      perQ.foreach { case (q, rows) =>
        assert(rows.map(_._4).sorted == (1L to 5L), s"query $q: ranks not 1..5 at cells=8")
        assert(rows.forall(_._2 != q), s"query $q: self-match at cells=8")
      }
      // and resetting the dial restores the exact default-plan result
      spark.conf.unset(Similarity.AnnCellsKey)
      assert(Similarity.annIvf(spark, sf)
        .as[(Long, Long, Double, Long)].collect().toSeq == ivfDefault,
        "unsetting the dial must restore the committed default face")
    } finally spark.conf.unset(Similarity.AnnCellsKey)
  }

  test("ann_knn_descent reaches >=0.9 recall of the exact graph at sf0.1 with linear-cost rounds") {
    // The descent build is the ~linear-in-N replacement for
    // ann_knn_graph's Theta(N^1.5) exact-IVF-candidate build (r20).
    // Truth is the exact top-5 graph computed driver-side (2000x2000
    // cosines at sf0.1 — spec-only; the engine never does this).
    val sfBig = "/root/testdata/sf0.1"
    val vecs = graft.sources.Tables.load(spark, sfBig, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val ids = vecs.map(_._1)
    val unit = vecs.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(_.toDouble / n)
    }
    val truth = scala.collection.mutable.Set.empty[(Long, Long)]
    var i = 0
    while (i < unit.length) {
      val sims = new Array[Double](unit.length)
      var j = 0
      while (j < unit.length) {
        if (j != i) {
          var d = 0.0; var k = 0
          while (k < unit(i).length) { d += unit(i)(k) * unit(j)(k); k += 1 }
          sims(j) = d
        } else sims(j) = -2.0
        j += 1
      }
      sims.zipWithIndex.sortBy { case (c, jj) => (-c, ids(jj)) }.take(5)
        .foreach { case (_, jj) => truth += ((ids(i), ids(jj))) }
      i += 1
    }
    val descent = Similarity.annKnnDescent(spark, sfBig)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    // shape contract: exactly ranks 1..5 per node, no self-edges
    descent.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 5L), s"node $q: ranks not 1..5")
      assert(rows.forall(_._2 != q), s"node $q: self-edge")
    }
    val ds = descent.map(r => (r._1, r._2)).toSet
    val recallTruth = truth.count(ds.contains).toDouble / truth.size
    info(s"descent recall@5 vs exact graph: $recallTruth")
    // measured 0.9206 on the fixed corpus (deterministic build)
    assert(recallTruth >= 0.9, s"descent recall vs exact graph $recallTruth < 0.9")
    // and >=0.9 of the edges the exact-candidate build got RIGHT — the
    // verdict's done-criterion for replacing ann_knn_graph at scale
    val ivf = Similarity.annKnnGraph(spark, sfBig)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfTrue = ivf.filter(truth.contains)
    val recallIvf = ivfTrue.count(ds.contains).toDouble / ivfTrue.size
    info(s"descent recall of ann_knn_graph's true edges: $recallIvf")
    // measured 0.9457 on the fixed corpus
    assert(recallIvf >= 0.9, s"descent recall of exact-build true edges $recallIvf < 0.9")
  }

  test("pipeline_mm_pretrain ties to its parent builds and the joint budget cut is exact") {
    // the composed mix's text totals must equal pipeline_pretrain_build's
    // shard ledger and its media totals pipeline_media_build's n_admitted
    // (the r20 done-criterion) — both at the driver's correctness scale
    val rows = Multimodal.pipelineMmPretrain(spark, sfMid)
      .select("mix", "kind", "n_docs", "n_subwords", "n_patches",
        "joint_cost", "n_selected", "sel_cost")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val textRows = rows.filter(r => r._1 == "joint" || r._1 == "text_only")
    val shards = graft.operators.Curate.pipelinePretrainBuild(spark, sfMid)
      .select("n_docs", "n_subwords").as[(Long, Long)].collect()
    assert(textRows.map(_._3).sum == shards.map(_._1).sum,
      "text-side doc count must tie to the pretrain build's shard ledger")
    assert(textRows.map(_._4).sum == shards.map(_._2).sum,
      "text-side subword mass must tie to the pretrain build's shard ledger")
    val mediaAdm = Multimodal.pipelineMediaBuild(spark, sfMid)
      .select("kind", "n_admitted").as[(String, Long)].collect().toMap
    val mixMedia = rows.filter(r => r._1 == "joint" || r._1 == "media_only")
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(mixMedia == mediaAdm.filter(_._2 > 0),
      s"per-kind media totals must tie to the media build's n_admitted: $mixMedia vs $mediaAdm")
    // joint budget contract: only the joint class is budgeted, the
    // selected mass respects the 80% integer cut, and selection is
    // a non-trivial prefix (some selected, not everything)
    rows.filter(r => r._1 != "joint").foreach { r =>
      assert(r._7 == 0L && r._8 == 0L, s"budget must only apply to the joint class: $r")
    }
    val jt = rows.filter(_._1 == "joint")
    val (jc, sc) = (jt.map(_._6).sum, jt.map(_._8).sum)
    assert(sc * 5 <= jc * 4, s"selected joint cost $sc exceeds the 80% budget of $jc")
    assert(jt.map(_._7).sum > 0, "budget selected nothing")
    assert(jt.map(_._7).sum < jt.map(_._3).sum, "budget selected everything")
  }

  test("mm_dedup_crossmodal labels every verified text pair from raw sha/phash") {
    val rows = Multimodal.mmDedupCrossmodal(spark, sfMid)
      .select("doc_a", "doc_b", "media_rel").as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // pair set is exactly the verified text near-dup pairs
    val tp = graft.operators.Dedup.dedupMinhashLsh(spark, sfMid)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == tp,
      "pair set must be exactly the verified text pairs")
    // every class label re-derives from raw sha / the phash pair face
    val sha = graft.sources.Tables.load(spark, sfMid, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .as[(Long, String)].collect().toMap
    val ph = Multimodal.mmDedupPhash(spark, sfMid)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    rows.foreach { case (a, b, rel) =>
      val expected =
        if (sha(a) == sha(b)) "exact"
        else if (ph((a, b))) "near"
        else "distinct"
      assert(rel == expected, s"pair ($a,$b): $rel != $expected")
    }
    // the link is informative: at sf0.1 all three classes occur
    // (sf0.01's verified pair set happens to carry no byte-identical
    // blobs, so the variety pin runs at the bench scale)
    val big = Multimodal.mmDedupCrossmodal(spark, "/root/testdata/sf0.1")
      .select("media_rel").as[String].collect().toSet
    assert(big == Set("exact", "near", "distinct"),
      s"expected all three media classes at sf0.1, got $big")
  }
}
