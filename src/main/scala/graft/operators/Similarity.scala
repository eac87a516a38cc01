package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{FloatVectorDot, GraftFunctions}
// Renaming import, NOT member defs: unqualified dotd/nrm in a lambda
// must resolve to another module (static VecMath$ access, captures
// nothing). A member def would be a `this` call and scalac then passes
// MODULE$ as a captured lambda arg — Task not serializable.
import graft.functions.VecMath.{dot => dotd, nrm}
import graft.sources.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2):
  * exact cosine top-k as the correctness baseline, random-hyperplane
  * LSH bucketing as the scale path.
  *
  * == Scale design ==
  * Brute force is O(Q×N): the query set is broadcast (small by
  * definition), so the corpus is scanned once with no shuffle, and
  * top-k is a per-query partial aggregate. At 100 TB the corpus side
  * stays partition-parallel; the LSH variant replaces the full cross
  * product with a bucket-equality join whose keys are uniform by
  * construction (signs of random projections). The inner loops run
  * through [[graft.functions.FloatVectorDot]] — a codegen'd Catalyst
  * expression — because Spark's higher-order `aggregate`/`zip_with`
  * evaluate interpreted and dominate O(pairs·dim) workloads.
  */
object Similarity {

  private val K = 5          // neighbors returned per query
  private val NQ = 10        // query set: vec_id < NQ
  private val PLANES = 8     // random hyperplanes → 256 buckets
  private val DIM = 64
  // IVF hyper-parameters — shared between the Spark pipeline and its
  // DuckDB oracle so the two replay the identical computation
  private val IVF_CELLS = 32
  private val IVF_ASSIGN = 2
  private val IVF_NPROBE = 3
  private val IVF_ITERS = 4

  /** Conf key for the IVF cell count — THE one ANN dial that must grow
    * ~√N at corpus scale (candidate bound ≈ N²·k/CELLS, so a fixed cell
    * count turns every decade of data into 100× more exact cosines —
    * the documented fixed-cell build wall of [[annKnnGraph]] /
    * [[dedupEmbeddingIvf]]). Default [[IVF_CELLS]]=32 keeps every
    * oracle pin and CORRECTNESS row bit-identical (the DuckDB oracle
    * unrolls k-means at 32 cells); a 100× corpus sets this to ~√N
    * (e.g. 320) and every codebook consumer — training, assignment,
    * the persisted IVF/kNN index tables (whose names carry the cell
    * count, so a conf change mints new tables instead of serving stale
    * ones) — follows. Non-default values are the SCALE path: oracle
    * hash parity is only defined at the default.
    */
  private[graft] val AnnCellsKey = "spark.graft.ann.cells"

  /** Effective IVF cell count: `spark.graft.ann.cells`, default 32. */
  private[graft] def ivfCells(s: SparkSession): Int = {
    val c = s.conf.get(AnnCellsKey, IVF_CELLS.toString).toInt
    require(c > 0, s"$AnnCellsKey must be positive, got $c")
    c
  }

  /** Per-corpus trained IVF codebooks (train-once model artifacts).
    * Keyed by the corpus FILE SIGNATURE (paths + sizes + mtimes), not
    * the directory alone, so rewriting the data at a path invalidates
    * the cached model instead of silently serving stale centroids.
    */
  private val ivfCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Float], Double)]]()

  /** Cheap driver-side corpus signature: no Spark job, just FS metadata. */
  private def corpusKey(s: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stats =
      try fs.listStatus(path).map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
      catch { case _: java.io.FileNotFoundException => Array(s"$dir:missing") }
    dir + "|" + stats.sorted.mkString(",")
  }

  import org.apache.spark.sql.graftshim.GraftSqlShim

  private def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(
      FloatVectorDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  private def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings")
    e.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
  }

  /** Deterministic pseudo-random hyperplane j: component d is
    * ((j·73 + d·179) mod 97)/97 − 0.5.
    */
  private def plane(j: Int): Array[Float] =
    Array.tabulate(DIM)(d => (((j * 73 + d * 179) % 97) / 97.0 - 0.5).toFloat)

  /** Canonical codebook assignment shared by [[annKnnGraph]] /
    * [[annGraphSearch]]: each vector's top-k trained cells by
    * (−cosine, cid) — the single tie-break every face must agree on,
    * or index and probe sides silently diverge. Returns the full
    * (vec_id, embedding, nrm, cell) projection; callers select down.
    */
  private def assignCells(s: SparkSession, dir: String,
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])], k: Int): DataFrame = {
    import s.implicits._
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    ds.flatMap { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map { case (cell, _) => (id, v, n, cell) }
    }.toDF("vec_id", "embedding", "nrm", "cell")
  }

  /** Exact cosine top-k: broadcast query set × corpus scan, then
    * row_number ≤ k per query with a vec_id tiebreak.
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < NQ).alias("q")
    val c = e.alias("c")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (dot(col("q.embedding"), col("c.embedding")) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The persisted ground-truth eval artifact: [[annBruteforce]]'s
    * exact top-[[K]] id pairs, memoized per (session, corpus
    * signature) as a stable checkpoint. Every recall face quotes its
    * scaladoc contract — "in production the truth set is computed
    * once per corpus version and persisted" — and five faces (the
    * recall/cells/graph curves, the multi-face eval, the planner
    * chains) were each re-running the O(Q·N) exact sweep. The
    * REGISTERED `ann_bruteforce` face keeps computing fresh.
    */
  private def bruteforceTruth(s: SparkSession, dir: String): DataFrame =
    graft.plans.SharedRel(s, "annTruth|" + dir, corpusKey(s, dir)) {
      annBruteforce(s, dir).select(col("query_id"), col("neighbor_id"))
    }

  /** Measured tuning-curve artifacts for the planner faces: a
    * production SLO planner consults the metrics table the curve run
    * persisted (each curve's own scale-design note: "at 100 TB the
    * curve is measured on a sampled query set and this plan is
    * free"), so the planner faces read the memoized curve instead of
    * re-running the sweep. The registered curve faces compute fresh.
    */
  private def recallCurveShared(s: SparkSession, dir: String): DataFrame =
    graft.plans.SharedRel(s, "annRecallCurve|" + dir,
      corpusKey(s, dir) + "|cells=" + ivfCells(s)) {
      annRecallCurve(s, dir)
    }

  private def graphRecallCurveShared(s: SparkSession, dir: String): DataFrame =
    graft.plans.SharedRel(s, "annGraphRecallCurve|" + dir,
      corpusKey(s, dir) + "|cells=" + ivfCells(s)) {
      annGraphRecallCurve(s, dir)
    }

  private def cellsCurveShared(s: SparkSession, dir: String): DataFrame =
    graft.plans.SharedRel(s, "annCellsCurve|" + dir, corpusKey(s, dir)) {
      annCellsCurve(s, dir)
    }

  /** Random-hyperplane LSH ANN: signature bit j = sign(v·planeⱼ);
    * candidates share the full 8-bit bucket, then exact cosine top-k
    * within the bucket. Trades recall for replacing the cross join
    * with a bucket-equality join.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val bucket = (0 until PLANES).map { j =>
      when(dot(col("embedding"), typedLit(plane(j))) > 0d, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    val e = emb(s, dir).withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") < NQ).alias("q")
    val c = e.alias("c")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c,
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (dot(col("q.embedding"), col("c.embedding")) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN with a TRAINED spherical k-means codebook: Lloyd
    * iterations run as whole-corpus Dataset passes (assign to
    * max-cosine centroid → fixed-point mean of unit vectors), then the
    * 32-cell coarse quantizer indexes every vector in its top-2 cells
    * (redundant assignment — spill-style overlap); queries probe their
    * nprobe=3 nearest cells and rank candidates by exact cosine.
    *
    * Tuning is measurement-driven (graft.DebugIvf sweeps recall vs
    * scanned fraction): on this isotropic corpus a plain trained
    * 16-cell quantizer is recall-NEGATIVE at equal scan cost versus
    * the r1 seed codebook (tight trained boundaries lose boundary
    * neighbors: 0.80 vs 0.92 recall@5 at ~12.5% scanned). 32 trained
    * cells × assign-2 × probe-3 matches the r1 codebook's recall at
    * both test scales (0.94 @ sf0.001, 0.92 @ sf0.01) for ~18%
    * scanned, with BALANCED cells — uniform shuffle keys and
    * predictable task sizes, which is what matters at 100 TB; on a
    * real clustered embedding corpus (unlike this synthetic noise) the
    * trained quantizer's scan advantage reverses the comparison. Index
    * cost: 2× rows, amortized by halved cell granularity.
    *
    * Determinism: per-cell sums accumulate in FIXED-POINT longs
    * (round(x/‖v‖·10⁶)) through a map-side-combined reduceGroups —
    * long addition is exactly commutative/associative, so the trained
    * centroids are bit-stable regardless of partition order (a double
    * sum would drift with scheduling). Only the 32×64 centroid model
    * ever reaches the driver — the corpus never does. Seeds are the
    * vectors with vec_id < 32; an emptied cell keeps its previous
    * centroid.
    */
  /** Train (or reuse) the per-corpus IVF codebook — see [[annIvf]]'s
    * scaladoc for the determinism story. Shared by the inline-search
    * query and the persisted-index builder.
    */
  private[graft] def trainedCodebook(s: SparkSession, dir: String,
      cells: Int = 0): Array[(Long, Array[Float], Double)] = {
    import s.implicits._
    // cells ≤ 0 (the default) resolves the conf dial; explicit values
    // are the curve faces sweeping fixed configs
    val CELLS = if (cells > 0) cells else ivfCells(s)
    val ITERS = IVF_ITERS
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    // Train-once semantics: the codebook is a model artifact (in a real
    // deployment it would be persisted beside the index), so per-corpus
    // training runs once per JVM and later invocations reuse it —
    // unless the files at the path changed (signature key). Training
    // runs OUTSIDE the map (computeIfAbsent would hold the bin lock
    // across ITERS Spark jobs — the Ingest fixture lesson, r11); a
    // lost putIfAbsent race just discards one redundant training run.
    val memoKey = corpusKey(s, dir) + "|cells=" + CELLS
    val cached = ivfCodebooks.get(memoKey)
    if (cached != null) return cached
    val trained = {
    val seeds = e.filter(_._1 < CELLS).collect().sortBy(_._1)
      .map { case (id, v) => (id, v, nrm(v)) }
    require(seeds.nonEmpty,
      s"ann_ivf needs codebook seed vectors (vec_id < $CELLS) in the embeddings table")
    var centroids = seeds
    for (_ <- 1 to ITERS) {
      val bc = s.sparkContext.broadcast(centroids)
      val cellAgg = e
        .map { case (_, v) =>
          val n = nrm(v)
          var bestCell = -1L; var bestCos = Double.MinValue
          bc.value.foreach { case (cid, cv, cn) =>
            val cos = dotd(v, cv) / (n * cn)
            if (cos > bestCos || (cos == bestCos && cid < bestCell)) {
              bestCos = cos; bestCell = cid
            }
          }
          // spherical k-means: accumulate UNIT vectors so the mean
          // direction isn't dominated by long vectors (assignment is
          // by cosine, so only direction matters)
          (bestCell, v.map(x => math.round(x / n * 1e6)), 1L)
        }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val sums = new Array[Long](math.max(a._2.length, b._2.length))
          var i = 0
          while (i < sums.length) {
            sums(i) = (if (i < a._2.length) a._2(i) else 0L) +
              (if (i < b._2.length) b._2(i) else 0L)
            i += 1
          }
          (a._1, sums, a._3 + b._3)
        }
        .map(_._2).collect().map(r => r._1 -> (r._2, r._3)).toMap
      bc.destroy() // per-iteration broadcast, dead after the collect
      centroids = centroids.map { case (cid, oldV, oldN) =>
        cellAgg.get(cid) match {
          case Some((sums, cnt)) =>
            val nv = sums.map(x => (x.toDouble / 1e6 / cnt).toFloat)
            (cid, nv, nrm(nv))
          case None => (cid, oldV, oldN)
        }
      }.sortBy(_._1)
    }
    centroids
    }
    val prev = ivfCodebooks.putIfAbsent(memoKey, trained)
    if (prev != null) prev else trained
  }

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ASSIGN = IVF_ASSIGN
    val NPROBE = IVF_NPROBE
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val centroids = trainedCodebook(s, dir)
    val codebook = s.sparkContext.broadcast(centroids)
    def cellsOf(v: Array[Float], n: Double, k: Int): Seq[Long] =
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map(_._1).toSeq
    // redundant assignment: each corpus vector indexed in its ASSIGN
    // nearest cells; a candidate found via both probed cells collapses
    // in the distinct below (identical cosine), keeping ranks clean
    val assigned = e.flatMap { case (id, v) =>
      val n = nrm(v)
      cellsOf(v, n, ASSIGN).map(c => (id, v, n, c))
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val probes = e.filter(_._1 < NQ).flatMap { case (id, v) =>
      val n = nrm(v)
      cellsOf(v, n, NPROBE).map(c => (id, v, n, c))
    }.toDF("q_id", "q_emb", "q_nrm", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Cell-bucketed embedding near-dup pairs — the REGISTERED scale
    * path for embedding dedup (SemDeDup-shaped: cluster first, compare
    * only within clusters). [[Dedup.dedupEmbedding]] keeps the exact
    * all-pairs contract as the by-construction-complete face; this
    * operator is what actually runs at corpus scale: every vector is
    * indexed in its [[IVF_ASSIGN]] nearest trained cells (the same
    * redundant assignment [[annIvf]] uses — boundary pairs whose
    * members straddle a cell edge still meet through the overlap),
    * candidate pairs meet in a cell-equality self-join, and the exact
    * cosine ≥ 0.45 verify lives in the join condition so non-pairs
    * never materialize a join row. Pairs found in both shared cells
    * collapse in the distinct (identical cosine).
    *
    * APPROXIMATE BY CONTRACT: a true pair assigned to disjoint cells
    * is missed — recall against the exact face is measured (spec pins
    * ≥ 0.9 on the planted near-dups) and the DuckDB oracle replays the
    * IDENTICAL approximation, so the hash check stays exact.
    *
    * == Scale design ==
    * Comparisons drop from N²/2 to Σ|cell|² ≈ N²·ASSIGN²/CELLS with
    * BALANCED trained cells (the annIvf tuning note — uniform shuffle
    * keys, predictable task sizes); CELLS grows ~√N at corpus scale,
    * so per-cell work stays bounded while the cross join never exists.
    * Only the 32×64 codebook reaches the driver. Each join leg
    * re-derives the cell assignment from its own corpus scan — a
    * deliberate trade: 32 codebook dots per vector is cheaper at any
    * scale than materializing the doubled (embedding-carrying)
    * relation, and the assignment is a pure function of (vector,
    * broadcast codebook) so the legs cannot diverge. A pathological
    * giant cell composes with [[Dedup.dedupEmbedding]]'s block
    * sub-bucketing; on this corpus the trained cells are measured
    * balanced.
    */
  def dedupEmbeddingIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    val assigned = e.flatMap { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(IVF_ASSIGN).map { case (cell, _) => (id, v, n, cell) }
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
    a.join(b, col("cell") === col("cell_b") && col("vec_a") < col("vec_b")
        && cos >= 0.45)
      .select(col("vec_a"), col("vec_b"), cos.as("cosine"))
      .distinct()
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Precision/cost curve for the cell-bucketed embedding dedup — the
    * (CELLS, ASSIGN) trade as an ORACLE-CHECKED artifact instead of a
    * spec constant (the same move [[Dedup.dedupThresholdCurve]] makes
    * for the Jaccard threshold): for each configuration, retrain the
    * codebook at that cell count, index every vector in its ASSIGN
    * nearest cells, and report how many candidate pairs the cell
    * buckets generate (the COST: Σ|cell|² comparisons) next to how
    * many verified near-dup pairs survive the exact cosine ≥ 0.45
    * check (the YIELD). Reading the curve: n_pairs at (32, 2) vs the
    * cheaper configurations shows what recall the extra cells/assign
    * actually buy on this corpus; n_candidates shows what they cost.
    *
    * == Scale design ==
    * Each configuration is the same bucketed join as
    * [[dedupEmbeddingIvf]] (never all-pairs; candidates ≈
    * N²·ASSIGN²/CELLS with balanced trained cells), aggregated to ONE
    * row before the tiny 6-row union. Codebooks memoize per (corpus,
    * cells), so the three trainings run once per JVM; only 8/16/32-row
    * models ever reach the driver. The exact cosine here is computed
    * per CANDIDATE (not gated into the join condition as the
    * production face does) because the candidate count IS the metric.
    *
    * SAMPLE-BOUND BY CONTRACT: sweeping FIXED cell counts is
    * quadratic in corpus size (the cells=8/assign=2 config is within
    * 2× of all-pairs — measured 14× wall for 10× vectors, SCALING.md
    * r12), which is how parameter tuning actually runs: on a bounded
    * sample whose pair statistics transfer, never on the corpus. The
    * corpus-scale path stays [[dedupEmbeddingIvf]], whose cell count
    * grows ~√N; this face chooses that config's parameters.
    */
  def dedupEmbeddingIvfCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    // Signature-once, sweep-many (the [[Dedup.dedupLshCurve]] shape,
    // r21-verdict item 1): the old formulation ran 6 INDEPENDENT
    // scan→assign→join→distinct→agg jobs — one per (cells, assign)
    // point, the assign=1 candidate set a strict subset of assign=2's —
    // and measured ANTI-parallel at 32 cores (driver scaling ratio
    // 0.20: 6 sequential barriers of small tasks). Now ONE assignment
    // pass ranks every vector against all three trained codebooks
    // (top-maxAssign cells, rank carried), ONE (cfg, cell)-keyed
    // self-join generates the widest candidate set, and every sweep
    // point derives from the folded per-pair rank level: a pair is an
    // assign-k candidate iff some shared cell holds both its members
    // at rank <= k, i.e. lvl = min over shared cells of
    // max(rank_a, rank_b) <= k. Identical candidates, identical exact
    // cosine (a pure function of the two vectors), identical 6 rows.
    val cellsCfgs = Seq(8, 16, 32)
    val assigns = Seq(1L, 2L)
    val maxAssign = assigns.max.toInt
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val books = cellsCfgs.map(c =>
      c.toLong -> s.sparkContext.broadcast(trainedCodebook(s, dir, c)))
    val assigned = e.flatMap { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      books.iterator.flatMap { case (cfg, cb) =>
        cb.value
          .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
          .sortBy { case (cid, cos) => (-cos, cid) }
          .take(maxAssign).iterator.zipWithIndex
          .map { case ((cell, _), r) => (cfg, id, v, n, cell, (r + 1).toLong) }
      }
    }.toDF("cfg", "vec_id", "embedding", "nrm", "cell", "rk")
    val a = assigned.select(col("cfg"), col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"), col("rk").as("ra"))
    val b = assigned.select(col("cfg").as("cfg_b"), col("cell").as("cell_b"),
      col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"),
      col("rk").as("rb"))
    val folded = a.join(b, col("cfg") === col("cfg_b")
        && col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .select(col("cfg"), col("vec_a"), col("vec_b"),
        greatest(col("ra"), col("rb")).as("lvl"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .groupBy(col("cfg"), col("vec_a"), col("vec_b"))
      .agg(min(col("lvl")).as("lvl"), max(col("cosine")).as("cosine"))
    val perCfg = folded.groupBy(col("cfg")).agg(
      coalesce(sum(when(col("lvl") <= 1L, 1L).otherwise(0L)), lit(0L)).as("c1"),
      count(lit(1)).as("c2"),
      coalesce(sum(when(col("lvl") <= 1L && col("cosine") >= 0.45, 1L)
        .otherwise(0L)), lit(0L)).as("p1"),
      coalesce(sum(when(col("cosine") >= 0.45, 1L).otherwise(0L)), lit(0L))
        .as("p2"))
    val stacked = perCfg.select(col("cfg"), expr(
      "stack(2, CAST(1 AS BIGINT), c1, p1, CAST(2 AS BIGINT), c2, p2)" +
        " AS (ak, nc, np)"))
    // fixed 6-row grid left-joined so a config with zero candidates
    // still emits its row (the old per-config global agg always did)
    val grid = cellsCfgs.flatMap(c => assigns.map(k => (c.toLong, k)))
      .toDF("cells", "assign_k")
    grid.join(stacked,
        grid("cells") === stacked("cfg") && grid("assign_k") === stacked("ak"),
        "left_outer")
      .select(col("cells"), col("assign_k"),
        coalesce(col("nc"), lit(0L)).as("n_candidates"),
        coalesce(col("np"), lit(0L)).as("n_pairs"))
      .orderBy(col("cells"), col("assign_k"))
  }

  /** Drop superseded persisted-index tables for the same dir tag. The
    * table NAME carries the corpus-signature hash so two signatures
    * for one dir never race on a warehouse path — but that means a
    * corpus REWRITE under the same dir (reingest, refreshed fixtures)
    * mints a new name and the prior table would otherwise leak its
    * catalog entry and parquet payload for the life of the session.
    * Called under the build memo's bin lock, right before the new
    * table is written: any `<prefix><dirTag>_<otherHash>` sibling is
    * dropped, catalog and files both.
    */
  private def dropSuperseded(s: SparkSession, prefix: String, dirTag: String,
      keep: String): Unit = {
    val pat = s"$prefix${dirTag}_"
    val hconf = s.sparkContext.hadoopConfiguration
    s.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith(pat) && n != keep)
      .foreach { n =>
        s.sql(s"DROP TABLE IF EXISTS $n")
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), n)
        loc.getFileSystem(hconf).delete(loc, true)
      }
  }

  /** Corpora whose persisted IVF index tables exist. Keyed by SESSION
    * identity + corpus signature (the codebook memo stays
    * session-independent — it's pure driver data — but these are
    * catalog tables, which die with their session's catalog): a second
    * SparkSession in the same JVM re-creates instead of hitting
    * TABLE_NOT_FOUND, and a memo hit whose tables were dropped
    * externally self-heals. The table NAME carries the signature hash
    * so two signatures for one dir never race on a warehouse path.
    */
  private val ivfIndexReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize the IVF index as TABLES: the 32-row codebook and the
    * redundantly-assigned postings (vec_id, embedding, nrm, cell)
    * bucketed by cell — the storage artifact a deployed ANN service
    * scans instead of re-deriving assignments per query.
    */
  private def ensureIvfIndex(s: SparkSession, dir: String): (String, String) = {
    import s.implicits._
    // cell count rides the signature: a conf change mints NEW index
    // tables (dropSuperseded reclaims the old) instead of serving a
    // codebook trained at a different cell count
    val ck = corpusKey(s, dir) + "|cells=" + ivfCells(s)
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tag = dirTag +
      "_" + java.lang.Long.toHexString(ck.hashCode.toLong & 0xffffffffL)
    val (cbTbl, idxTbl) = (s"graft_ivf_codebook_$tag", s"graft_ivf_index_$tag")
    val key = s"${System.identityHashCode(s)}|$ck"
    if (ivfIndexReady.containsKey(key) &&
        !(s.catalog.tableExists(cbTbl) && s.catalog.tableExists(idxTbl)))
      ivfIndexReady.remove(key)
    // computeIfAbsent kept DELIBERATELY here (unlike the model memos):
    // the guarded work is catalog DDL on fixed table names, and the bin
    // lock is what serializes two threads racing the same CTAS.
    ivfIndexReady.computeIfAbsent(key, _ => {
      val hconf = s.sparkContext.hadoopConfiguration
      dropSuperseded(s, "graft_ivf_codebook_", dirTag, cbTbl)
      dropSuperseded(s, "graft_ivf_index_", dirTag, idxTbl)
      Seq(cbTbl, idxTbl).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
        loc.getFileSystem(hconf).delete(loc, true)
      }
      val cb = trainedCodebook(s, dir).toSeq.toDF("cid", "cv", "cn")
      cb.write.mode("overwrite").format("parquet").saveAsTable(cbTbl)
      // declarative assignment: every vector ranked against the 32
      // centroids (broadcast), top-ASSIGN cells kept — all vector_dot
      val e = emb(s, dir)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("acos").desc, col("cid"))
      val assigned = e.crossJoin(broadcast(cb))
        .withColumn("acos", dot(col("embedding"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("arn", row_number().over(w))
        .filter(col("arn") <= IVF_ASSIGN)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
      Tables.writeBucketed(assigned, idxTbl, 8, "cell", "cell")
      tag
    })
    (cbTbl, idxTbl)
  }

  /** IVF ANN over the PERSISTED index: probes rank the query vectors
    * against the codebook TABLE (32 rows, broadcast), candidates come
    * from the bucketed postings table — query time never trains or
    * assigns, it scans the index. Fully declarative (no typed
    * closures in the search path); results identical to [[annIvf]],
    * so it shares the unrolled-k-means oracle.
    */
  /** Incremental index maintenance with a FROZEN codebook — the
    * production ingest path (FAISS `add()` without `train()`): the
    * arriving batch (every 5th vector, a deterministic 20% stand-in
    * for a day's ingest) is assigned to its [[IVF_ASSIGN]] nearest
    * existing cells without retraining, and the operator emits the
    * per-cell growth ledger — base/new/total counts, exact
    * growth_ppm, and a `retrain_flag` that fires when a cell grows at
    * more than twice the batch's global 20/80 ratio (500 000 ppm):
    * disproportionate growth means the arriving distribution has
    * drifted off the trained centroids, the signal a production store
    * uses to schedule retraining.
    *
    * == Scale design ==
    * The codebook is O(CELLS) broadcast model state; assignment is
    * one scan with a per-row top-k over the broadcast (exactly the
    * [[annIvf]] index leg); the ledger is one map-side-combinable
    * grouped count on cell keys that cannot skew more than the index
    * itself does — which is precisely what the ledger measures.
    */
  def annIndexUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Delta-sized (r22, the verdict's delta-face criterion): the
    // production ingest path (FAISS add-without-train) never
    // re-assigns the standing corpus — n_base per cell is a FOLD OVER
    // THE PERSISTED POSTINGS TABLE ([[ensureIvfIndex]], the artifact
    // every indexed search face already scans), and only the arriving
    // batch is assigned (frozen codebook, |Δ|·CELLS work). The
    // persisted postings use the IDENTICAL canonical assignment (same
    // trained codebook, same (−cos, cid) tie-break), so the ledger is
    // unchanged — the oracle replays the full recompute and still
    // hash-matches. The old shape re-assigned base + batch from
    // scratch: corpus-sized work for a delta-sized question.
    val (_, idxTbl) = ensureIvfIndex(s, dir)
    val baseCells = s.table(idxTbl).filter(col("vec_id") % 5 =!= 4)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_base"))
    val batch = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .filter(_._1 % 5 == 4)
    val newCells = assignCells(s, dir, batch, IVF_ASSIGN)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_new"))
    baseCells.join(newCells, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(col("cell"), col("n_base"), col("n_new"),
        (col("n_base") + col("n_new")).as("n_total"),
        expr("1000000 * n_new div greatest(n_base, 1)").as("growth_ppm"))
      .withColumn("retrain_flag", col("growth_ppm") > 500000L)
      .orderBy(col("cell"))
  }

  def annIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val (cbTbl, idxTbl) = ensureIvfIndex(s, dir)
    val cb = s.table(cbTbl)
    val q = emb(s, dir).filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cb))
      .withColumn("pcos", dot(col("q_emb"), col("cv")) / (col("q_nrm") * col("cn")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= IVF_NPROBE)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cid").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes.alias("p")).join(s.table(idxTbl).alias("idx"),
        col("p.cell") === col("idx.cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------- PQ
  // Product-quantization hyper-parameters, shared with the oracle
  private val PQ_SUB = 2          // subspaces: dims split in half
  private val PQ_K = 4            // centroids per subspace
  private val PQ_ITERS = 2
  private val HALF = DIM / PQ_SUB
  private val IVFPQ_POOL = 40     // ADC pool size fed to the exact rerank
  // IVFPQ trains a FINER per-subspace codebook than the standalone PQ
  // face: 16 centroids → 256 distinct code pairs. With PQ_K=4 (16
  // pairs for 500 vectors) the ADC collapses candidates into so few
  // distance levels that the pool cut degenerates to id order
  // (measured recall@5 0.38 at pool 20); 16² codes lift it to 0.66,
  // and pool 40 over the ~94 probed candidates restores IVF-level
  // recall (0.90 vs the IVF face's 0.94). FAISS ships 256 centroids
  // per subspace for the same discrimination reason.
  private val IVFPQ_K = 16

  /** codebook rows (sub, cid, centroid) — train-once model artifact. */
  private val pqCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Int, Long, Array[Float])]]()

  /** Per-subspace L2 k-means codebooks, trained exactly like
    * [[trainedCodebook]] but on raw (un-normalized) HALF-dim
    * sub-vectors with L2 assignment — classic PQ. Means accumulate
    * integer micro-units so partial-aggregation order cannot perturb
    * the centroid floats, and the DuckDB oracle replays the identical
    * recurrence (seeds = sub-vectors of vec_id < PQ_K, fixed
    * [[PQ_ITERS]] rounds, (d, cid) tie order).
    */
  private def trainedPqCodebook(s: SparkSession, dir: String,
      k: Int = PQ_K): Array[(Int, Long, Array[Float])] = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    def l2(a: Array[Float], b: Array[Float]): Double =
      dotd(a, a) - 2 * dotd(a, b) + dotd(b, b)
    val half = HALF // local copy: a closure touching the field would
    // drag the whole (non-serializable) enclosing object into the task
    def sub(v: Array[Float], i: Int): Array[Float] =
      java.util.Arrays.copyOfRange(v, i * half, (i + 1) * half)
    // Train outside the map + putIfAbsent install — same bin-lock
    // rationale as trainedCodebook; a lost race wastes one training.
    val memoKey = corpusKey(s, dir) + s"|pq$k"
    val cached = pqCodebooks.get(memoKey)
    if (cached != null) return cached
    val trained = {
      (0 until PQ_SUB).flatMap { sx =>
        val seeds = e.filter(_._1 < k).collect().sortBy(_._1)
          .map { case (id, v) => (id, sub(v, sx)) }
        require(seeds.nonEmpty,
          s"ann_pq needs codebook seed vectors (vec_id < $k) in the embeddings table")
        var cents = seeds
        for (_ <- 1 to PQ_ITERS) {
          val bc = s.sparkContext.broadcast(cents)
          val agg = e.map { case (_, v) =>
            val sv = sub(v, sx)
            var best = -1L; var bd = Double.MaxValue
            bc.value.foreach { case (cid, cv) => // ascending cid ⇒ low cid wins ties
              val d = l2(sv, cv)
              if (d < bd) { bd = d; best = cid }
            }
            (best, sv.map(x => math.round(x * 1e6)), 1L)
          }
            .groupByKey(_._1)
            .reduceGroups { (a, b) =>
              val sums = new Array[Long](math.max(a._2.length, b._2.length))
              var i = 0
              while (i < sums.length) {
                sums(i) = (if (i < a._2.length) a._2(i) else 0L) +
                  (if (i < b._2.length) b._2(i) else 0L)
                i += 1
              }
              (a._1, sums, a._3 + b._3)
            }
            .map(_._2).collect().map(r => r._1 -> (r._2, r._3)).toMap
          bc.destroy()
          cents = cents.map { case (cid, oldV) =>
            agg.get(cid) match {
              case Some((sums, cnt)) =>
                (cid, sums.map(x => (x.toDouble / 1e6 / cnt).toFloat))
              case None => (cid, oldV)
            }
          }.sortBy(_._1)
        }
        cents.map { case (cid, cv) => (sx, cid, cv) }
      }.toArray
    }
    val prev = pqCodebooks.putIfAbsent(memoKey, trained)
    if (prev != null) prev else trained
  }

  /** L2 distance as stable column math: ‖a‖² − 2⟨a,b⟩ + ‖b‖², every dot
    * a sequential [[FloatVectorDot]] fold ⇒ bit-identical cross-engine.
    */
  private def l2c(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** ANN via product quantization + asymmetric distance computation —
    * the memory-bound scale path of the ANN family (brute = exact, LSH
    * = bucketed, IVF = partitioned, PQ = compressed): each corpus
    * vector collapses to PQ_SUB small codes, and query-time distance is
    * a pair of table lookups instead of a 64-dim dot.
    *
    * == Scale design ==
    * Encoding is one scan: the codebook (8 rows) broadcasts, and the
    * per-(vector, subspace) argmin is a map-side-combinable
    * `min(struct(d, cid))` — no window over the corpus. The ADC join
    * streams the encoded corpus once against the broadcast NQ×PQ_K
    * lookup table, and the per-query top-k runs through the custom
    * [[graft.plans.TopKPerGroup]] physical operator (per-partition ≤k
    * heap BEFORE the exchange — the window twin would shuffle all N×NQ
    * candidate rows to NQ partitions). At 100 TB the 16-byte codes are
    * the only corpus-sized state after the one encode pass.
    */
  /** (vec_id, sub, cid, d): every vector's HALF-dim sub-vectors scored
    * (L2) against the broadcast PQ codebook — the relation both the
    * encode argmin and the query LUT project from. Shared by [[annPq]]
    * and the [[annIvfPq]] composition.
    */
  private def pqScored(s: SparkSession, dir: String, k: Int = PQ_K): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val cbDf = trainedPqCodebook(s, dir, k).toSeq.toDF("sub", "cid", "cv")
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val subs = e.select(col("vec_id"), explode(array(
        struct(lit(0).as("sub"), slice(col("embedding"), 1, HALF).as("sv")),
        struct(lit(1).as("sub"), slice(col("embedding"), HALF + 1, HALF).as("sv")))).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    subs.join(broadcast(cbDf), "sub")
      .select(col("vec_id"), col("sub"), col("cid"), l2c(col("sv"), col("cv")).as("d"))
  }

  /** PQ codes (vec_id, ec0, ec1) from the scored relation: per-(vector,
    * subspace) argmin as a map-side-combinable `min(struct(d, cid))`
    * (lexicographic ⇒ (min d, min cid)), both subspaces folded in ONE
    * vec_id-keyed aggregate — the conditional min ignores the other
    * subspace's null rows, so the encode costs a single corpus shuffle
    * (the r13 plan audit found the former two-stage groupBy paying a
    * second exchange for nothing).
    */
  private def pqEncoded(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("vec_id"))
      .agg(min(when(col("sub") === 0, struct(col("d"), col("cid")))).as("m0"),
        min(when(col("sub") === 1, struct(col("d"), col("cid")))).as("m1"))
      .select(col("vec_id"), col("m0.cid").as("ec0"), col("m1.cid").as("ec1"))

  def annPq(s: SparkSession, dir: String): DataFrame = {
    val scored = pqScored(s, dir)
    val enc = pqEncoded(scored)
    val lut = scored.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("sub"), col("cid"), col("d"))
    val l0 = lut.filter(col("sub") === 0)
      .select(col("q_id"), col("cid").as("c0"), col("d").as("d0"))
    val l1 = lut.filter(col("sub") === 1)
      .select(col("q_id").as("q1"), col("cid").as("c1"), col("d").as("d1"))
    val adc = enc.join(broadcast(l0), col("ec0") === col("c0"))
      .join(broadcast(l1), col("q_id") === col("q1") && col("ec1") === col("c1"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (col("d0") + col("d1")).as("adist"))
    graft.plans.GraftOps.topKPerGroup(adc, Seq("query_id"),
        Seq("adist" -> false, "neighbor_id" -> false), k = K, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF + PQ composed — the FAISS-IVFPQ production search shape, and
    * the query a 100 TB embedding store actually runs: the coarse
    * quantizer ([[trainedCodebook]], the annIvf cells) prunes the
    * corpus to the [[IVF_NPROBE]] probed cells' postings, ADC over the
    * PQ codes ranks those candidates byte-cheaply, and only the
    * [[IVFPQ_POOL]] best approximate hits pay for an exact cosine —
    * the final top-[[K]] is exact ON THE POOL. Both model halves are
    * the already-trained artifacts ([[annIvf]]'s cells, [[annPq]]'s
    * subspace codebooks), so this operator is pure composition: probe,
    * ADC-rank, rerank.
    *
    * == Scale design ==
    * The cell pruning bounds the ADC join to nprobe/cells of the
    * corpus; ADC itself touches only (candidate, code) pairs against a
    * broadcast NQ×PQ_K LUT — no full-dim math until the pool. Both
    * top-k cuts run through [[graft.plans.TopKPerGroup]] (per-partition
    * ≤k heaps BEFORE any exchange), and the exact rerank reads full
    * vectors for only pool·NQ rows. At scale the expensive full-dim
    * pass is O(NQ · pool), independent of corpus size.
    */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val cb = trainedCodebook(s, dir).toSeq.toDF("cid", "cv", "cn")
    val e = emb(s, dir)
    // redundant corpus assignment + query probes — declarative ranks
    // against the broadcast codebook table (the annIvfIndexed shape)
    val wa = Window.partitionBy(col("vec_id")).orderBy(col("acos").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cb))
      .withColumn("acos", dot(col("embedding"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("arn", row_number().over(wa))
      .filter(col("arn") <= IVF_ASSIGN)
      .select(col("vec_id"), col("cid").as("cell"))
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val wp = Window.partitionBy(col("q_id")).orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cb))
      .withColumn("pcos", dot(col("q_emb"), col("cv")) / (col("q_nrm") * col("cn")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= IVF_NPROBE)
      .select(col("q_id"), col("cid").as("cell"))
    val cand = broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    // ADC rank within the probed candidates (finer IVFPQ_K codebook)
    val scored = pqScored(s, dir, IVFPQ_K)
    val enc = pqEncoded(scored)
    val lut = scored.filter(col("vec_id") < NQ)
    val l0 = lut.filter(col("sub") === 0)
      .select(col("vec_id").as("ql0"), col("cid").as("c0"), col("d").as("d0"))
    val l1 = lut.filter(col("sub") === 1)
      .select(col("vec_id").as("ql1"), col("cid").as("c1"), col("d").as("d1"))
    val adc = cand.join(enc, cand("neighbor_id") === enc("vec_id"))
      .join(broadcast(l0), col("query_id") === col("ql0") && col("ec0") === col("c0"))
      .join(broadcast(l1), col("query_id") === col("ql1") && col("ec1") === col("c1"))
      .select(col("query_id"), col("neighbor_id"), (col("d0") + col("d1")).as("adist"))
    val pool = graft.plans.GraftOps.topKPerGroup(adc, Seq("query_id"),
        Seq("adist" -> false, "neighbor_id" -> false), k = IVFPQ_POOL, rankName = "arank")
      .select(col("query_id"), col("neighbor_id"))
    // exact cosine rerank on the pool only
    val exact = broadcast(pool)
      .join(e, pool("neighbor_id") === e("vec_id"))
      .join(broadcast(q), col("query_id") === col("q_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
    graft.plans.GraftOps.topKPerGroup(exact, Seq("query_id"),
        Seq("cosine" -> true, "neighbor_id" -> false), k = K, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ANN recall evaluation — the harness a production vector store
    * runs after every reindex/retune: each approximate face's top-K
    * (LSH, IVF, IVFPQ) scored against the exact brute-force top-K,
    * per (face, query): hit count, returned count, exact integer-ppm
    * recall. This is the measurement behind every recall floor the
    * specs pin — registered so the evaluation itself is oracle-checked
    * instead of living only in test code.
    *
    * == Scale design ==
    * The ground truth is brute force over the (small, broadcast)
    * query set — O(Q·N) once, the price of an eval; each face then
    * joins its K·Q result rows against the K·Q truth via a broadcast
    * hash join, so the eval overhead beyond running the searches is
    * negligible at any corpus size. In production the truth set is
    * computed once per corpus version and persisted.
    */
  def annRecallEval(s: SparkSession, dir: String): DataFrame = {
    val bf = bruteforceTruth(s, dir)
    val faces = Seq(
      ("graph", annGraphSearch(s, dir)),
      ("ivf", annIvf(s, dir)),
      ("ivf_pq", annIvfPq(s, dir)),
      ("lsh", annLsh(s, dir)))
    val tagged = faces.map { case (n, df) =>
      df.select(lit(n).as("face"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    tagged.alias("a")
      .join(broadcast(bf.alias("t")),
        col("a.query_id") === col("t.query_id") &&
          col("a.neighbor_id") === col("t.neighbor_id"), "left")
      .groupBy(col("face"), col("a.query_id").as("query_id"))
      .agg(count(col("t.query_id")).as("n_hits"), count(lit(1)).as("n_returned"))
      .select(col("face"), col("query_id"), col("n_hits"), col("n_returned"),
        expr(s"1000000 * n_hits div $K").as("recall_ppm"))
      .orderBy(col("face"), col("query_id"))
  }

  /** DuckDB twin: each face's full oracle statement inlined as a
    * derived table (their WITH scopes stay local, so the three CTE
    * chains cannot collide), left-joined to the brute-force truth.
    */
  lazy val annRecallEvalSql: String =
    s"""WITH bf AS (SELECT query_id, neighbor_id FROM ($annBruteforceSql)),
       |apx AS (
       |  SELECT 'graph' AS face, query_id, neighbor_id FROM ($annGraphSearchSql)
       |  UNION ALL
       |  SELECT 'ivf', query_id, neighbor_id FROM ($annIvfSql)
       |  UNION ALL
       |  SELECT 'ivf_pq', query_id, neighbor_id FROM ($annIvfPqSql)
       |  UNION ALL
       |  SELECT 'lsh', query_id, neighbor_id FROM ($annLshSql))
       |SELECT a.face, a.query_id,
       |  count(bf.query_id) AS n_hits, count(*) AS n_returned,
       |  1000000 * count(bf.query_id) // $K AS recall_ppm
       |FROM apx a LEFT JOIN bf
       |  ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
       |GROUP BY a.face, a.query_id
       |ORDER BY a.face, a.query_id""".stripMargin

  /** DuckDB twin: the per-subspace k-means replayed as unrolled CTEs
    * (the [[annIvfSql]] trick), then encode + ADC with the identical
    * L2 fold — doubles and ranks bit-identical.
    */
  /** The PQ-training replay chain, prefix-parameterized like
    * [[ivfCodebookCtesAt]] so it can share one statement with the IVF
    * chain (the [[annIvfPqSql]] composition). Ends with the encoded
    * corpus (`${p}enc`) and the query LUT (`${p}lut`).
    */
  private def pqCodebookCtesAt(p: String, k: Int = PQ_K): Seq[String] = {
    def l2(a: String, b: String): String =
      s"(${ivfFold(a, a)} - 2*${ivfFold(a, b)} + ${ivfFold(b, b)})"
    val base = Seq(
      s"${p}sv AS (SELECT vec_id, 0 AS sub, embedding[1:$HALF] AS sv FROM embeddings" +
        s" UNION ALL SELECT vec_id, 1, embedding[${HALF + 1}:$DIM] FROM embeddings)",
      s"${p}b0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM ${p}sv WHERE vec_id < $k)")
    val iters = (1 to PQ_ITERS).flatMap { it =>
      val pv = it - 1
      Seq(
        s"${p}sc$it AS (SELECT s.vec_id, s.sub, b.cid, ${l2("s.sv", "b.cv")} AS d FROM ${p}sv s JOIN ${p}b$pv b ON b.sub = s.sub)",
        s"${p}a$it AS (SELECT vec_id, sub, cid FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn FROM ${p}sc$it) WHERE rn = 1)",
        s"${p}c$it AS (SELECT sub, cid, count(*) AS cnt FROM ${p}a$it GROUP BY 1, 2)",
        s"${p}f$it AS (SELECT a.sub, a.cid, t.d, sum(CAST(floor(CAST(s.sv[t.d] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS m" +
          s" FROM ${p}a$it a JOIN ${p}sv s ON s.vec_id = a.vec_id AND s.sub = a.sub CROSS JOIN range(1, ${HALF + 1}) t(d) GROUP BY 1, 2, 3)",
        s"${p}m$it AS (SELECT f.sub, f.cid, list(CAST(CAST(f.m AS DOUBLE) / 1e6 / c.cnt AS REAL) ORDER BY f.d) AS cv" +
          s" FROM ${p}f$it f JOIN ${p}c$it c ON c.sub = f.sub AND c.cid = f.cid GROUP BY 1, 2)",
        s"${p}b$it AS (SELECT b.sub, b.cid, COALESCE(m.cv, b.cv) AS cv FROM ${p}b$pv b LEFT JOIN ${p}m$it m ON m.sub = b.sub AND m.cid = b.cid)")
    }
    val index = Seq(
      s"${p}scf AS (SELECT s.vec_id, s.sub, b.cid, ${l2("s.sv", "b.cv")} AS d FROM ${p}sv s JOIN ${p}b$PQ_ITERS b ON b.sub = s.sub)",
      s"${p}af AS (SELECT vec_id, sub, cid FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn FROM ${p}scf) WHERE rn = 1)",
      s"${p}enc AS (SELECT vec_id, max(CASE WHEN sub = 0 THEN cid END) AS ec0, max(CASE WHEN sub = 1 THEN cid END) AS ec1 FROM ${p}af GROUP BY 1)",
      s"${p}lut AS (SELECT vec_id AS q_id, sub, cid, d FROM ${p}scf WHERE vec_id < $NQ)")
    base ++ iters ++ index
  }

  val annPqSql: String = {
    val search = Seq(
      "adc AS (SELECT l0.q_id AS query_id, e.vec_id AS neighbor_id, l0.d + l1.d AS adist" +
        " FROM enc e JOIN lut l0 ON l0.sub = 0 AND l0.cid = e.ec0" +
        " JOIN lut l1 ON l1.sub = 1 AND l1.cid = e.ec1 AND l1.q_id = l0.q_id" +
        " WHERE e.vec_id <> l0.q_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS BIGINT) AS rank FROM adc)")
    "WITH " + (pqCodebookCtesAt("") ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, adist, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  /** DuckDB twin of the composition: the IVF chain (probes +
    * redundant assignment) and a `q`-prefixed PQ chain (codes + LUT)
    * replayed side by side, candidates from probed cells, ADC pool of
    * [[IVFPQ_POOL]], exact sequential-fold cosine on the pool only —
    * pool membership, cosines, and ranks bit-identical.
    */
  // lazy: textually precedes the ivfCodebookCtes definition it splices
  lazy val annIvfPqSql: String = {
    val search = Seq(
      s"prb AS (SELECT vec_id, cid AS cell FROM rk WHERE rn <= $IVF_NPROBE AND vec_id < $NQ)",
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM prb q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      "adc AS (SELECT c.query_id, c.neighbor_id, l0.d + l1.d AS adist" +
        " FROM cand c JOIN qenc e ON e.vec_id = c.neighbor_id" +
        " JOIN qlut l0 ON l0.q_id = c.query_id AND l0.sub = 0 AND l0.cid = e.ec0" +
        " JOIN qlut l1 ON l1.q_id = c.query_id AND l1.sub = 1 AND l1.cid = e.ec1)",
      s"pool AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS arn FROM adc) WHERE arn <= $IVFPQ_POOL)",
      s"px AS (SELECT p.query_id, p.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine" +
        " FROM pool p JOIN n nq ON nq.vec_id = p.query_id JOIN n nc ON nc.vec_id = p.neighbor_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM px)")
    "WITH " + (ivfCodebookCtes ++ pqCodebookCtesAt("q", IVFPQ_K) ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  // ------------------------------------------------------- kNN graph
  /** k-NN GRAPH over the embedding corpus (r14): every vector's top-5
    * neighbors by exact cosine among its IVF candidates — the
    * all-points generalization of [[annIvf]]'s bounded query set, and
    * the input relation for graph-side semantic curation (SemDeDup
    * clustering, connected components over embeddings, link-based
    * quality propagation all consume a kNN edge list).
    *
    * == Scale design ==
    * The brute-force graph is O(N²); this face never builds it. Both
    * sides carry the trained cell key, so candidate generation is a
    * cell-keyed SHUFFLE join (no broadcast — the probe side is the
    * whole corpus here, unlike annIvf's 10-query broadcast):
    * candidates ≈ N·PROBE·ASSIGN·avg|cell|, with avg|cell| = N/CELLS
    * and CELLS grown ~√N at scale. Exact rerank happens per candidate
    * inside the join projection; the per-query top-k window shuffles
    * only (query, k) rows. Recall vs the exact graph is measured by
    * [[annRecallEval]]'s machinery — the probe dial, not this plan, is
    * the recall lever.
    */
  def annKnnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val index = assignCells(s, dir, e, IVF_ASSIGN)
    val probes = assignCells(s, dir, e, IVF_NPROBE)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(index,
        probes("cell") === index("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------ NN-descent build
  private val ND_ROUNDS = 4      // fixed refinement rounds (unrolled in the oracle)
  private val ND_K = 20          // internal neighbor-list width during the build

  /** kNN-graph build via NN-DESCENT (r20) — the ~linear-in-N
    * replacement for [[annKnnGraph]]'s exact-IVF-candidate build,
    * whose rerank volume is Θ(N^1.5) under the √N cells schedule (the
    * one flagged scale wall of the r19 verdict). Two phases, both
    * linear in N:
    *
    * '''Seed''': every vector joins a deterministic RING inside each
    * of its top-[[IVF_ASSIGN]] trained cells — node at position p
    * (cell members ordered by vec_id) proposes the members at
    * positions (p+1 … p+[[K]]) mod |cell|. The ring is generated by
    * exploding the K offsets and equi-joining on (cell, position), so
    * seed candidates are O(N·K·assign) — never the |cell|² enumeration
    * of the exact build. Cell locality makes the seeds warm (most true
    * neighbors share a cell); the ring's vec_id order makes them
    * deterministic.
    *
    * '''Refine''' ([[ND_ROUNDS]] fixed rounds): the NN-descent move —
    * a node's candidates are the neighbors of its neighbors in the
    * UNDIRECTED current graph. Reverse edges are capped at the top-K
    * per node (same (−cosine, id) tie-break) so the undirected degree
    * is ≤ 2K and the per-round candidate volume is ≤ 4K²·N regardless
    * of hub skew — the property that keeps the build O(N·K²·rounds)
    * at any corpus size. Candidates are scored by exact cosine
    * ([[graft.functions.FloatVectorDot]], two vec_id-keyed hash
    * joins), merged with the incumbent edges, and cut back to top-K
    * per node. Each round ends in a [[graft.plans.Checkpoints]]
    * stable checkpoint: the loop re-reads materialized edges instead
    * of stacking three self-referencing join trees.
    *
    * == Scale design ==
    * Everything is shuffle-by-key on vec_id or (cell, pos): no
    * corpus-sized broadcast, no |cell|² candidate join, no driver
    * collect. Decade cells (SCALING.md r20): the 100× build runs at
    * ~linear slope vs [[annKnnGraph]]'s measured 220× — the verdict's
    * `ann_knn_descent` done-criterion. Recall vs the exact-candidate
    * graph is spec-pinned ≥ 0.9 at sf0.1; the rounds dial (not the
    * plan) is the recall lever, exactly like nprobe on the IVF side.
    */
  def annKnnDescent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.Checkpoints.StableSyntax
    // Normalized vectors cached ONCE (lazily — an eager checkpoint
    // here measured SLOWER, its blocking job outweighing the saved
    // rescans): score() joins the corpus twice per round, so
    // 2·(1+ND_ROUNDS) broadcast builds were each re-scanning parquet
    // and re-computing ‖v‖ — a production descent build normalizes
    // the corpus once before iterating.
    val e = emb(s, dir).cache()
    val eDs = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    def score(cand: DataFrame): DataFrame =
      cand.join(e.select(col("vec_id").as("src"),
          col("embedding").as("s_emb"), col("nrm").as("s_nrm")), Seq("src"))
        .join(e.select(col("vec_id").as("dst"),
          col("embedding").as("d_emb"), col("nrm").as("d_nrm")), Seq("dst"))
        .select(col("src"), col("dst"),
          (dot(col("s_emb"), col("d_emb")) / (col("s_nrm") * col("d_nrm"))).as("cosine"))
    def topK(scored: DataFrame): DataFrame =
      graft.plans.GraftOps.topKPerGroup(scored, Seq("src"),
          Seq("cosine" -> true, "dst" -> false), k = ND_K, rankName = "rn")
        .select(col("src"), col("dst"), col("cosine"))
    // seed rings inside each assigned cell; pos feeds BOTH sides of
    // the ring join below — materialized once instead of re-running
    // the assignment flatMap + two windows per side
    val part = assignCells(s, dir, eDs, IVF_ASSIGN).select(col("vec_id"), col("cell"))
    val pos = part.select(col("vec_id"), col("cell"),
      (row_number().over(Window.partitionBy(col("cell")).orderBy(col("vec_id"))) - 1)
        .cast("long").as("pos"),
      count(lit(1)).over(Window.partitionBy(col("cell"))).as("csize"))
      .cache()
    val seeds = pos
      .withColumn("j", explode(typedLit((1 to ND_K).map(_.toLong))))
      .filter(col("j") < col("csize"))
      .select(col("vec_id").as("src"), col("cell"),
        ((col("pos") + col("j")) % col("csize")).as("rpos"))
      .join(pos.select(col("cell"), col("pos").as("rpos"), col("vec_id").as("dst")),
        Seq("cell", "rpos"))
      .select(col("src"), col("dst")).distinct()
    // `fresh` marks edges added in the last round — the classic
    // NN-descent new/old pruning: an old-old pair through an old mid
    // was already generated (and lost the top-K) in a previous round,
    // so only pairs touching a fresh edge are scored. This is what
    // keeps the per-round cosine volume COLLAPSING as the graph
    // converges instead of re-paying 4K²·N every round.
    // Per-round EAGER checkpoint, kept deliberately (r22): the
    // checkpoint-every-other-round variant (odd rounds ending in a lazy
    // .cache() so two rounds run as one job DAG) was implemented and
    // MEASURED SLOWER — isolated warm 10.2-11.9 s vs 6.3-7.6 s
    // steady-state at sf0.1 / 32 cores: the two-round-deep plan
    // re-plans the odd round's whole
    // subtree per consumer and the InMemoryRelation build costs more
    // than the barrier it saves. Same verdict as r21's eager-vs-lazy
    // corpus cache trial: measure, keep the loser out.
    var g = topK(score(seeds)).withColumn("fresh", lit(1L)).stableCheckpoint()
    for (_ <- 1 to ND_ROUNDS) {
      val rev = graft.plans.GraftOps.topKPerGroup(
          g.select(col("dst").as("src"), col("src").as("dst"),
            col("cosine"), col("fresh")),
          Seq("src"), Seq("cosine" -> true, "dst" -> false), k = ND_K, rankName = "rn")
        .select(col("src"), col("dst"), col("fresh"))
      // und feeds BOTH sides of the neighbor-of-neighbor join on
      // different keys (mid=dst vs mid=src), so without a (lazy)
      // cache the union+groupBy executes twice per round
      val und = g.select(col("src"), col("dst"), col("fresh")).unionByName(rev)
        .groupBy(col("src"), col("dst")).agg(max(col("fresh")).as("fresh"))
        .cache()
      val cand = und.select(col("src"), col("dst").as("mid"), col("fresh").as("f_a"))
        .join(und.select(col("src").as("mid"), col("dst"), col("fresh").as("f_b")),
          Seq("mid"))
        .filter(col("src") =!= col("dst") && (col("f_a") === 1L || col("f_b") === 1L))
        .select(col("src"), col("dst")).distinct()
      val merged = topK(
        g.select(col("src"), col("dst"), col("cosine"))
          .unionByName(score(cand)).distinct())
      g = merged.join(
          g.select(col("src"), col("dst"), lit(1L).as("seen")),
          Seq("src", "dst"), "left")
        .select(col("src"), col("dst"), col("cosine"),
          when(col("seen").isNull, 1L).otherwise(0L).as("fresh"))
        .stableCheckpoint()
      // g's checkpoint has consumed und — release its blocks now
      und.unpersist(false)
    }
    e.unpersist(false)
    pos.unpersist(false)
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    g.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("src").as("query_id"), col("dst").as("neighbor_id"),
        col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------ graph-walk search
  private val GS_BEAM = 8        // beam width kept between expansion rounds
  private val GS_ROUNDS = 2      // fixed expansion rounds (unrolled in the oracle)
  private val GS_SEED_PROBE = 1  // seeds come from the single nearest cell

  private val knnGraphReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize the corpus kNN graph as a TABLE — the index artifact
    * [[annGraphSearch]] walks. Built once per corpus signature (the
    * [[ensureIvfIndex]] pattern, same self-healing catalog check): a
    * production graph-ANN store rebuilds the graph on reindex, not per
    * query, so the search face's cost is the walk, not the build —
    * this is what restores the search's corpus-size-independent
    * per-query bound ([[annKnnGraph]]'s fixed-cell build wall is the
    * REGISTERED build face's documented cost, paid once here).
    */
  private def ensureKnnGraph(s: SparkSession, dir: String): String = {
    // cell count rides the signature: a conf change mints NEW index
    // tables (dropSuperseded reclaims the old) instead of serving a
    // codebook trained at a different cell count
    val ck = corpusKey(s, dir) + "|cells=" + ivfCells(s)
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tag = dirTag +
      "_" + java.lang.Long.toHexString(ck.hashCode.toLong & 0xffffffffL)
    val tbl = s"graft_knn_graph_$tag"
    val key = s"${System.identityHashCode(s)}|$ck"
    if (knnGraphReady.containsKey(key) && !s.catalog.tableExists(tbl))
      knnGraphReady.remove(key)
    knnGraphReady.computeIfAbsent(key, _ => {
      val hconf = s.sparkContext.hadoopConfiguration
      dropSuperseded(s, "graft_knn_graph_", dirTag, tbl)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
      loc.getFileSystem(hconf).delete(loc, true)
      annKnnGraph(s, dir)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        .write.mode("overwrite").format("parquet").saveAsTable(tbl)
      tag
    })
    tbl
  }

  /** Graph-walk ANN search (r15) — the HNSW-flavored beam search that
    * gives [[annKnnGraph]]'s edge list its in-engine consumer: seed
    * each query with the candidates of its SINGLE nearest IVF cell
    * (probe-1, a third of [[annIvf]]'s probe-3 scan), then run
    * [[GS_ROUNDS]] fixed rounds of expand-over-knn-edges — every beam
    * survivor contributes its top-[[K]] graph neighbors as new
    * candidates, exact cosine scores them, and only the top-[[GS_BEAM]]
    * stay in the beam. The final top-[[K]] is exact over everything
    * visited. Greedy graph descent reaches neighbors the seed cell
    * missed (the boundary-loss failure mode probe-1 IVF suffers) while
    * scoring strictly fewer candidates than probe-3.
    *
    * == Scale design ==
    * The walk is query-bounded end to end: seeds ≈ |cell|·ASSIGN rows
    * per query, each round adds ≤ BEAM·K edge lookups, and the frontier
    * (NQ·BEAM rows) is broadcast into the src-keyed edge relation — the
    * corpus-sized knn graph is built ONCE per corpus (an index artifact
    * in production, reused across queries) and only its probed rows are
    * touched. Exact full-dim cosine is paid only for visited ids, so
    * search cost is O(|cell| + ROUNDS·BEAM·K) per query, independent of
    * corpus size — the defining property that makes graph ANN the
    * production search shape when nprobe scans stop fitting the latency
    * budget. Fixed rounds (not walk-to-convergence) keep the plan
    * static, the oracle unrollable, and the latency bounded.
    */
  def annGraphSearch(s: SparkSession, dir: String): DataFrame = {
    // the walk reads the corpus knn graph as a PERSISTED index
    // artifact (built once per corpus signature, the ivf-index
    // pattern) — scanned at search time exactly like a deployed
    // graph store
    graft.plans.GraftOps.topKPerGroup(
        graphScore(s, dir, graphWalkVisited(s, dir, GS_BEAM)), Seq("query_id"),
        Seq("cosine" -> true, "neighbor_id" -> false), k = K, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact cosine over a (query_id, neighbor_id) id set — queries are
    * broadcast, the corpus side is a neighbor-keyed hash join. Shared
    * by the search face and the beam-width curve.
    */
  private def graphScore(s: SparkSession, dir: String, v: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id2"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    v.join(e, v("neighbor_id") === e("vec_id"))
      .join(broadcast(q), col("query_id") === col("q_id2"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
  }

  /** The beam walk's visited set at a given beam width: probe-1 cell
    * seeds, then [[GS_ROUNDS]] expand-over-persisted-edges rounds
    * keeping the top-`beam` per query between rounds. Returns the
    * final (query_id, neighbor_id) visited relation — its row count
    * IS the search's exact-scoring cost, which is what the beam dial
    * trades against recall.
    */
  private def graphWalkVisited(s: SparkSession, dir: String, beam: Int): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val edges = s.table(ensureKnnGraph(s, dir))
    val eDs = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val index = assignCells(s, dir, eDs, IVF_ASSIGN)
      .select(col("vec_id"), col("cell"))
    val seeds = assignCells(s, dir, eDs.filter(_._1 < NQ), GS_SEED_PROBE)
      .select(col("vec_id").as("q_id"), col("cell"))
    var visited: DataFrame = broadcast(seeds)
      .join(index, seeds("cell") === index("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    for (_ <- 1 to GS_ROUNDS) {
      val front = graft.plans.GraftOps.topKPerGroup(
          graphScore(s, dir, visited), Seq("query_id"),
          Seq("cosine" -> true, "neighbor_id" -> false), k = beam, rankName = "brn")
        .select(col("query_id"), col("neighbor_id"))
      val expand = broadcast(front)
        .join(edges, front("neighbor_id") === edges("src"))
        .filter(col("dst") =!= col("query_id"))
        .select(col("query_id"), col("dst").as("neighbor_id"))
      visited = visited.unionByName(expand).distinct()
    }
    visited
  }

  private val GS_CURVE_BEAMS = Seq(2, 4, 8)

  /** Beam-width tuning curve for the graph walk (r16 — completing the
    * curve symmetry: [[annRecallCurve]] sweeps the IVF probe dial,
    * [[Dedup]]'s lsh curve the banding, this the graph face's ONE
    * dial): per beam ∈ {2, 4, 8}, the walk's exact-scoring cost (the
    * final visited-set size — every visited id is scored with one
    * full-dim cosine) next to top-[[K]] recall vs the brute-force
    * truth in exact ppm. The artifact that justifies the production
    * face's fixed [[GS_BEAM]] = 8: recall should saturate while cost
    * keeps climbing.
    *
    * == Scale design ==
    * Three walks over the SAME persisted edge table (built once, the
    * [[ensureKnnGraph]] memo) — each is query-bounded like the search
    * face; the truth join is K·NQ broadcast; output is 3 rows. Beam
    * cuts change the walk itself, so the legs cannot be filters over
    * one max-beam relation the way the probe curve's configs are —
    * but each leg is O(queries), so running three IS the cheap shape.
    */
  def annGraphRecallCurve(s: SparkSession, dir: String): DataFrame = {
    val bf = bruteforceTruth(s, dir)
    val legs = GS_CURVE_BEAMS.map { b =>
      val visited = graphWalkVisited(s, dir, b)
      val cost = visited.agg(count(lit(1)).as("n_candidates"))
      val top = graft.plans.GraftOps.topKPerGroup(
          graphScore(s, dir, visited), Seq("query_id"),
          Seq("cosine" -> true, "neighbor_id" -> false), k = K, rankName = "rank")
        .select(col("query_id"), col("neighbor_id"))
      val scored = top.alias("t")
        .join(broadcast(bf.alias("b")),
          col("t.query_id") === col("b.query_id") &&
            col("t.neighbor_id") === col("b.neighbor_id"), "left")
        .agg(count(lit(1)).as("n_returned"),
          count(col("b.query_id")).as("n_hits"))
      cost.crossJoin(scored)
        .select(lit(b.toLong).as("beam"), col("n_candidates"),
          col("n_returned"), col("n_hits"),
          expr(s"1000000 * n_hits div ${NQ.toLong * K}").as("recall_ppm"))
    }
    legs.reduce(_ unionByName _).orderBy(col("beam"))
  }

  // --------------------------------------------- graph upsert (delta)
  private val knnBaseReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Persist YESTERDAY'S graph artifact: the kNN edge list (with its
    * exact cosines and ranks) plus the per-node probe-cell relation,
    * both restricted to the BASE corpus (vec_id % 5 ≠ 4 — the
    * [[annIndexUpsert]] ingest split) under the frozen full-corpus
    * codebook. The probe table is part of the artifact on purpose: a
    * production graph store persists per-node routing metadata
    * precisely so delta maintenance can find affected nodes without
    * re-assigning the corpus.
    */
  private def ensureKnnGraphBase(s: SparkSession, dir: String): (String, String) = {
    import s.implicits._
    // cell count rides the signature: a conf change mints NEW index
    // tables (dropSuperseded reclaims the old) instead of serving a
    // codebook trained at a different cell count
    val ck = corpusKey(s, dir) + "|cells=" + ivfCells(s)
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tag = dirTag +
      "_" + java.lang.Long.toHexString(ck.hashCode.toLong & 0xffffffffL)
    val (edgeTbl, probeTbl) = (s"graft_knn_base_$tag", s"graft_knn_probes_$tag")
    val key = s"${System.identityHashCode(s)}|$ck"
    if (knnBaseReady.containsKey(key) &&
        !(s.catalog.tableExists(edgeTbl) && s.catalog.tableExists(probeTbl)))
      knnBaseReady.remove(key)
    knnBaseReady.computeIfAbsent(key, _ => {
      val hconf = s.sparkContext.hadoopConfiguration
      dropSuperseded(s, "graft_knn_base_", dirTag, edgeTbl)
      dropSuperseded(s, "graft_knn_probes_", dirTag, probeTbl)
      Seq(edgeTbl, probeTbl).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
        loc.getFileSystem(hconf).delete(loc, true)
      }
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .filter(_._1 % 5 != 4)
      val index = assignCells(s, dir, e, IVF_ASSIGN)
      val probes = assignCells(s, dir, e, IVF_NPROBE)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("cell"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cosine").desc, col("dst"))
      probes.join(index,
          probes("cell") === index("cell") && col("q_id") =!= col("vec_id"))
        .select(col("q_id").as("src"), col("vec_id").as("dst"),
          (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
        .distinct()
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .write.mode("overwrite").format("parquet").saveAsTable(edgeTbl)
      probes.select(col("q_id").as("vec_id"), col("cell"))
        .write.mode("overwrite").format("parquet").saveAsTable(probeTbl)
      tag
    })
    (edgeTbl, probeTbl)
  }

  /** Incremental kNN-graph maintenance (r17) — the graph family's
    * delta face, completing the symmetry [[annIndexUpsert]] gives the
    * IVF index: the arriving batch (vec_id % 5 = 4, the ingest split)
    * is folded into YESTERDAY'S persisted graph without a full
    * rebuild, and the emitted ledger diffs the upserted graph against
    * the from-scratch rebuild it provably equals:
    *
    *   1. batch assignment — the frozen codebook (FAISS add-without-
    *      train), batch-bounded.
    *   2. new-node edges — batch probes × (persisted base postings ∪
    *      batch postings), exact cosine, top-[[K]].
    *   3. affected-node refresh — base nodes whose PERSISTED probe
    *      cells received a batch posting merge their stored top-[[K]]
    *      (cosines ride the artifact, never rescored) with the newly
    *      scored batch candidates; one top-[[K]] re-rank. The merge
    *      identity makes this EXACT: any base candidate of the
    *      rebuilt top-K survives the base-only top-K, so stored ∪
    *      batch-scored covers the rebuilt candidate set.
    *
    * Ledger (single row): node counts, affected count, kept / added /
    * dropped / new edge counts, and an order-independent digest of
    * the upserted edge set — which the oracle computes from the full
    * rebuild, so the hash check IS the upsert ≡ rebuild proof
    * (re-proven edge-for-edge in the spec).
    *
    * == Scale design ==
    * The delta path reads three persisted artifacts (base edges, base
    * probes, IVF postings) and computes only batch-sized work: batch
    * assignment is |Δ|·CELLS, candidate scoring is bounded by the
    * batch's postings per probed cell, the merge re-rank rides the
    * O(N·K) stored edge relation through [[graft.plans.GraftOps
    * .topKPerGroup]] (no window sort), and the diff ledger is one
    * aggregate over O(N·K) rows. No full-graph candidate join exists
    * anywhere in the plan (plan-pinned).
    */
  def annGraphUpsert(s: SparkSession, dir: String): DataFrame = {
    val (edgeTbl, _) = ensureKnnGraphBase(s, dir)
    val baseEdges = s.table(edgeTbl)
    val up = annGraphUpsertEdges(s, dir)
    // the diff ledger: upserted vs the persisted artifact
    val cls = up.select(col("src"), col("dst"), col("rank"), lit(1).as("in_f"))
      .join(baseEdges.select(col("src"), col("dst"), lit(1).as("in_b")),
        Seq("src", "dst"), "full_outer")
    val mix = ((col("src") * 131071L + col("dst")) * (col("rank") + 1L)) % 1000000007L
    val aff = cls.filter(col("src") % 5 =!= 4 &&
        (col("in_b").isNull || col("in_f").isNull))
      .agg(countDistinct(col("src")).as("n_affected"))
    val nodes = up.agg(
      countDistinct(when(col("src") % 5 =!= 4, col("src"))).as("n_base_nodes"),
      countDistinct(when(col("src") % 5 === 4, col("src"))).as("n_new_nodes"))
    cls.agg(
        sum(when(col("in_b").isNotNull && col("in_f").isNotNull, 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("in_f").isNotNull && col("in_b").isNull &&
          col("src") % 5 =!= 4, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_b").isNotNull && col("in_f").isNull, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("in_f").isNotNull && col("src") % 5 === 4, 1L).otherwise(0L))
          .as("n_new_edges"),
        sum(when(col("in_f").isNotNull, mix).otherwise(0L)).as("graph_digest"))
      .crossJoin(broadcast(nodes))
      .crossJoin(broadcast(aff))
      .select(col("n_base_nodes"), col("n_new_nodes"), col("n_affected"),
        col("n_kept"), col("n_added"), col("n_dropped"), col("n_new_edges"),
        col("graph_digest"))
  }

  /** The upserted edge relation itself (the spec's hook for the
    * upsert ≡ rebuild proof): base-node merges + new-node edges,
    * exactly the ledger's `in_f` side. */
  private[graft] def annGraphUpsertEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val (edgeTbl, probeTbl) = ensureKnnGraphBase(s, dir)
    val (_, idxTbl) = ensureIvfIndex(s, dir)
    val baseEdges = s.table(edgeTbl)
    val baseProbes = s.table(probeTbl)
    val basePostings = s.table(idxTbl).filter(col("vec_id") % 5 =!= 4)
    val batch = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .filter(_._1 % 5 == 4)
    val batchIdx = assignCells(s, dir, batch, IVF_ASSIGN)
    val batchProbes = assignCells(s, dir, batch, IVF_NPROBE)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    val index = basePostings.select(col("vec_id"), col("embedding"), col("nrm"),
        col("cell"))
      .unionByName(batchIdx)
    val newEdges = graft.plans.GraftOps.topKPerGroup(
        broadcast(batchProbes).join(index,
            batchProbes("cell") === index("cell") && col("q_id") =!= col("vec_id"))
          .select(col("q_id").as("src"), col("vec_id").as("dst"),
            (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
              .as("cosine"))
          .distinct(),
        Seq("src"), Seq("cosine" -> true, "dst" -> false), k = K, rankName = "rank")
      .select(col("src"), col("dst"), col("rank").cast("long").as("rank"))
    val em = emb(s, dir)
    val touched = baseProbes
      .join(broadcast(batchIdx.select(col("cell"), col("vec_id").as("dst"))),
        Seq("cell"))
      .filter(col("vec_id") =!= col("dst"))
      .select(col("vec_id").as("src"), col("dst")).distinct()
    // dst is ALWAYS a batch vector (it comes from batchIdx), so the
    // broadcast side is the |Δ| batch slice, not the full corpus —
    // at 100 TB an N-sized broadcast for |Δ|-sized work is the delta
    // face rebuilding more base than the delta needs (r22; the filter
    // also pushes into the parquet scan). The src side stays a join:
    // touched srcs are base nodes, corpus-sized in the worst case.
    val scored = touched
      .join(em.select(col("vec_id").as("src"), col("embedding").as("s_emb"),
        col("nrm").as("s_nrm")), Seq("src"))
      .join(broadcast(em.filter(col("vec_id") % 5 === 4)
        .select(col("vec_id").as("dst"),
          col("embedding").as("d_emb"), col("nrm").as("d_nrm"))), Seq("dst"))
      .select(col("src"), col("dst"),
        (dot(col("s_emb"), col("d_emb")) / (col("s_nrm") * col("d_nrm"))).as("cosine"))
    val upBase = graft.plans.GraftOps.topKPerGroup(
        baseEdges.select(col("src"), col("dst"), col("cosine")).unionByName(scored),
        Seq("src"), Seq("cosine" -> true, "dst" -> false), k = K, rankName = "rank")
      .select(col("src"), col("dst"), col("rank").cast("long").as("rank"))
    upBase.unionByName(newEdges)
  }

  // ------------------------------------------------- filtered search
  /** Filtered ANN search (r14, the predicate-constrained face every
    * production vector store ships — "nearest neighbors WHERE label is
    * even"): [[annIvf]]'s probe-3 search with the metadata predicate
    * pushed INTO the index side before the cell join, so filtered-out
    * vectors never become candidates (pre-filtering, not the
    * rank-then-discard post-filter that under-fills k when the
    * predicate is selective). Top-[[K]] per query among qualifying
    * neighbors, same total order as the unfiltered face.
    *
    * == Scale design ==
    * The predicate prunes the posting (index) side at the scan — at a
    * selective predicate this SHRINKS the candidate join below the
    * unfiltered face's cost; the filtered index is exactly the
    * partition-pruned scan a label-partitioned vector table gives for
    * free. Probe side unchanged (NQ-bounded broadcast).
    */
  def annFilteredSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    def cellsOf(v: Array[Float], n: Double, k: Int): Seq[Long] =
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map(_._1).toSeq
    // predicate pushed below the index build: filtered vectors are
    // never assigned, never joined
    val assigned = e.filter(_._3 % 2 == 0).flatMap { case (id, v, _) =>
      val n = math.sqrt(dotd(v, v))
      cellsOf(v, n, IVF_ASSIGN).map(c => (id, v, n, c))
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val probes = e.filter(_._1 < NQ).flatMap { case (id, v, _) =>
      val n = math.sqrt(dotd(v, v))
      cellsOf(v, n, IVF_NPROBE).map(c => (id, v, n, c))
    }.toDF("q_id", "q_emb", "q_nrm", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB twin: [[annIvfSql]] with the label predicate applied to
    * the index-side assignment relation. */
  // lazy: textually precedes the ivfCodebookCtes definition it splices
  lazy val annFilteredSearchSql: String = {
    val search = Seq(
      "flt AS (SELECT a.vec_id, a.cell FROM asg a JOIN embeddings emb ON emb.vec_id = a.vec_id WHERE emb.label % 2 = 0)",
      s"prb AS (SELECT vec_id, cid AS cell FROM rk WHERE rn <= $IVF_NPROBE AND vec_id < $NQ)",
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM prb q JOIN flt a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"p AS (SELECT c.query_id, c.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM cand c JOIN n nq ON nq.vec_id = c.query_id JOIN n nc ON nc.vec_id = c.neighbor_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  // ----------------------------------------------- hard negatives
  /** Hard-negative mining from the IVF index (r14 wave 11) — the
    * contrastive-training data op every retrieval/embedding trainer
    * runs against its own vector store: per query, the top-[[K]]
    * highest-cosine candidates from the probed cells that are NOT
    * near-duplicates (exact cosine < 0.45, [[Dedup.dedupEmbedding]]'s
    * verify threshold) — "close enough to be informative, far enough
    * to be a true negative". Random in-batch negatives are trivially
    * easy; the index's near-misses are exactly the gradient-rich
    * pairs, and the near-dup cut keeps false negatives (unlabeled
    * positives) out of the loss.
    *
    * == Scale design ==
    * The [[annIvf]] probe machinery verbatim — broadcast probes into
    * the cell-partitioned assignment join, exact cosine in one
    * codegen'd expression, distinct collapses redundant-assignment
    * duplicates — with one extra filter before the rank window. The
    * negative cut removes the near-dup head, so the per-query rank
    * window ranks the same candidate relation the search face already
    * pays for.
    */
  def annHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    def cellsOf(v: Array[Float], n: Double, k: Int): Seq[Long] =
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map(_._1).toSeq
    val assigned = e.flatMap { case (id, v) =>
      val n = nrm(v)
      cellsOf(v, n, IVF_ASSIGN).map(c => (id, v, n, c))
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val probes = e.filter(_._1 < NQ).flatMap { case (id, v) =>
      val n = nrm(v)
      cellsOf(v, n, IVF_NPROBE).map(c => (id, v, n, c))
    }.toDF("q_id", "q_emb", "q_nrm", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .distinct()
      .filter(col("cosine") < 0.45)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB twin: [[annIvfSql]]'s chain with the near-dup cut applied
    * before the rank window. */
  lazy val annHardNegativesSql: String = {
    val search = Seq(
      s"prb AS (SELECT vec_id, cid AS cell FROM rk WHERE rn <= $IVF_NPROBE AND vec_id < $NQ)",
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM prb q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"p AS (SELECT c.query_id, c.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM cand c JOIN n nq ON nq.vec_id = c.query_id JOIN n nc ON nc.vec_id = c.neighbor_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p WHERE cosine < 0.45)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  // ----------------------------------------------- probe tuning curve
  /** ANN probe-dial tuning curve (r14, completing the curve symmetry:
    * [[dedupEmbeddingIvfCurve]] sweeps (CELLS, ASSIGN) for the dedup
    * face; this sweeps NPROBE ∈ 1..4 for the search face): for each
    * probe count, the candidate-set size the probed cells generate
    * (the COST — exact reranks paid per query) and the ppm recall of
    * the resulting top-[[K]] vs the brute-force truth (the YIELD).
    * Reading the curve: the smallest probe whose recall clears the
    * product bar is the production setting — [[annIvf]]'s fixed
    * probe-3 is justified by this artifact instead of by a spec
    * constant.
    *
    * == Scale design ==
    * ONE search at the maximal probe carries its probe rank along, so
    * the four configurations are FILTERS over a single candidate
    * relation (probe rank ≤ p) — no per-config re-search; the config
    * grid joins as a broadcast 4-row cross. Truth is the bounded
    * [[NQ]]-query brute-force list ([[annBruteforce]]'s contract —
    * query-set-bounded, corpus-linear). Everything after the one
    * candidate join is O(configs · NQ · K).
    */
  def annRecallCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val MAXP = 4
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    def cellsRanked(v: Array[Float], n: Double, k: Int): Seq[(Long, Int)] =
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).zipWithIndex.map { case ((cell, _), i) => (cell, i + 1) }.toSeq
    val assigned = e.flatMap { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      cellsRanked(v, n, IVF_ASSIGN).map { case (c, _) => (id, v, n, c) }
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val probes = e.filter(_._1 < NQ).flatMap { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      cellsRanked(v, n, MAXP).map { case (c, pr) => (id, v, n, c, pr) }
    }.toDF("q_id", "q_emb", "q_nrm", "cell", "probe_rank")
    // one candidate relation, each pair tagged with the BEST probe rank
    // that reaches it — configs filter, never re-search
    val cand = broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"))
      .agg(min(col("probe_rank")).as("min_probe"),
        max(dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cosine"))
    val configs = s.createDataFrame((1 to MAXP).map(p => Tuple1(p.toLong)))
      .toDF("nprobe")
    val perConf = broadcast(configs).join(cand, col("min_probe") <= col("nprobe"))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val top = perConf.withColumn("rk", row_number().over(w)).filter(col("rk") <= K)
    val truth = bruteforceTruth(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val nCand = perConf.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
    top.join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("n_returned"))
      .join(nCand, Seq("nprobe"))
      .select(col("nprobe"), col("n_candidates"), col("n_returned"),
        col("n_hits"),
        expr(s"1000000 * n_hits div (${NQ.toLong} * ${K.toLong})").as("recall_ppm"))
      .orderBy(col("nprobe"))
  }

  // -------------------------------------------------------- SemDeDup
  /** Semantic dedup EXECUTED (r14, the embedding-space curation cut of
    * Abbas et al.'s SemDeDup, composed from [[dedupEmbeddingIvf]]'s
    * verified pair face): within the trained IVF cells, any vector
    * with a LOWER-id exact-cosine ≥ 0.45 neighbor is dropped (min-id
    * keeps the exemplar — the deterministic one-pass rule; the
    * transitive-component policy is [[graft.operators.Dedup]]'s
    * components machinery and is a different, costlier contract), and
    * the per-label retention ledger is emitted — the readout a
    * curation run records before shipping the surviving corpus.
    *
    * == Scale design ==
    * Pair generation is the identical Σ|cell|² bucketed join as
    * dedupEmbeddingIvf (never all-pairs; cells grow ~√N); the drop
    * set is one distinct projection of the pair relation and
    * BROADCASTS (|pairs| ≪ N by the near-dup contract); the ledger is
    * one map-side-combinable rollup onto O(labels) keys.
    */
  def corpusSemdedup(s: SparkSession, dir: String): DataFrame = {
    val dropped = dedupEmbeddingIvf(s, dir)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"))
      .join(broadcast(dropped), Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("label"), col("n_vecs"), col("n_dropped"),
        (col("n_vecs") - col("n_dropped")).as("n_kept"),
        expr("(n_vecs - n_dropped) * 1000000 div n_vecs").as("kept_ppm"))
      .orderBy(col("label"))
  }

  // ------------------------------------------------------- OOD audit
  /** Embedding out-of-distribution audit (r14 wave 19) — the
    * data-quality face of the ANN family: a vector far from EVERY
    * trained centroid is an outlier the index serves badly and a
    * curation pass reviews first (broken encoder output, empty-doc
    * embeddings, wrong-modality rows). Every corpus vector is scored
    * by its best-centroid cosine (the same spherical codebook the
    * IVF faces train — shared memoized model, so the audit can never
    * disagree with the index about geometry); the bottom 1% by
    * (cos_micro, vec_id) RANK are flagged — a rank cut, not a float
    * threshold, so the page set is deterministic and SF-invariant.
    * Cosines are floored to micro units BEFORE ranking on both
    * engines, so the order key is integer-stable.
    *
    * == Scale design ==
    * One O(N·CELLS) map-side scoring pass against the broadcast
    * codebook, then the two-phase range-partitioned rank
    * ([[graft.operators.Analytics.globalRowPos]]) over thin
    * (id, cell, cos) rows — no global single-task sort; output is
    * N/100 rows.
    */
  def annOod(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
    val centroids = trainedCodebook(s, dir)
    val codebook = s.sparkContext.broadcast(centroids)
    val best = e.map { case (id, v, lbl) =>
      val n = math.sqrt(dotd(v, v))
      var bc = -1L; var bcos = Double.MinValue
      codebook.value.foreach { case (cid, cv, cn) =>
        val cos = dotd(v, cv) / (n * cn)
        if (cos > bcos || (cos == bcos && cid < bc)) { bcos = cos; bc = cid }
      }
      (id, lbl.toLong, bc, math.floor(bcos * 1e6 + 0.5).toLong)
    }.toDF("vec_id", "label", "best_cell", "cos_micro")
    Analytics.globalRowPos(best, Seq.empty,
        Seq(col("cos_micro"), col("vec_id")), "ood_rank", "__n")
      .filter(col("ood_rank") <= expr("(`__n` + 99) div 100"))
      .select(col("vec_id"), col("label"), col("best_cell"),
        col("cos_micro"), col("ood_rank"))
      .orderBy(col("ood_rank"))
  }

  /** DuckDB twin: the shared codebook replay's final score table,
    * best-centroid row per vector, the same micro-floored rank cut. */
  lazy val annOodSql: String =
    "WITH " + (ivfCodebookCtes ++ Seq(
      "oodb AS (SELECT vec_id, cid AS best_cell, cos FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM sc) WHERE rn = 1)",
      "oodc AS (SELECT vec_id, best_cell, CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro FROM oodb)",
      "rko AS (SELECT *, row_number() OVER (ORDER BY cos_micro, vec_id) AS ood_rank, count(*) OVER () AS nn2 FROM oodc)"
    )).mkString(",\n") +
      """
        |SELECT r.vec_id, CAST(e.label AS BIGINT) AS label, r.best_cell,
        |  r.cos_micro, CAST(r.ood_rank AS BIGINT) AS ood_rank
        |FROM rko r JOIN embeddings e ON e.vec_id = r.vec_id
        |WHERE r.ood_rank <= (r.nn2 + 99) // 100
        |ORDER BY ood_rank""".stripMargin

  /** Embedding-distribution drift monitor — the dq_drift move applied
    * to the vector space: partition the embedding corpus into a
    * reference half (even vec_id — the standing snapshot) and a
    * current half (odd — the new batch), assign every vector to its
    * nearest trained-codebook cell (the shared IVF artifact), and
    * compare the two CELL-OCCUPANCY distributions in exact ppm. The
    * per-cell delta table plus the total-variation summary is the
    * page an embedding pipeline raises when its upstream model or
    * corpus shifts — a drifted encoder repopulates cells long before
    * any single cosine looks wrong. Occupancy is O(CELLS) additive
    * state, so the monitor is mergeable across batches by
    * construction (the CMS-face property).
    *
    * == Scale design ==
    * One embeddings scan scores O(CELLS) broadcast-codebook dots
    * map-side and folds to the O(CELLS) occupancy ledger; shares,
    * deltas, and the TVD window all run on those ≤32 rows. At 100 TB
    * the monitor is scan + 32 longs of state per half.
    */
  /** IVF posting-list balance audit (r14 wave 36 —
    * [[graft.operators.Curate.corpusShardSkew]]'s straggler discipline
    * pointed at the index: probed-cell latency at serving time is the
    * LARGEST posting list the probe touches, so an unbalanced coarse
    * quantizer quietly turns nprobe=3 into one straggler cell): every
    * corpus vector assigned to its [[IVF_ASSIGN]] nearest trained
    * cells (exactly [[annIvf]]'s redundant indexing), per cell the
    * posting count, exact-ppm share of all postings, the signed
    * deviation from the uniform share, and a `hot` flag where a cell
    * holds over 2× its uniform share (the re-train/split dial —
    * k-means on drifted data concentrates; [[annIndexUpsert]]'s
    * growth ledger says when, this says WHERE).
    *
    * == Scale design ==
    * One embeddings scan against the broadcast O(CELLS) codebook (the
    * sanctioned k-means-assignment escape), folding map-side onto the
    * O(CELLS) ledger; ratios are window math over that ledger (the
    * documented bounded-relation window).
    */
  def annCellBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    val assigned = e.flatMap { case (_, v) =>
      val n = math.sqrt(dotd(v, v))
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(IVF_ASSIGN).map(_._1)
    }.toDF("cell")
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_postings"))
      .withColumn("tot", expr("sum(n_postings) over ()"))
      .withColumn("nc", expr("count(1) over ()"))
      .select(col("cell"), col("n_postings"),
        expr("1000000 * n_postings div tot").as("share_ppm"),
        expr("1000000 * n_postings div tot - 1000000 div nc").as("dev_ppm"),
        expr("CAST(n_postings * nc > 2 * tot AS LONG)").as("hot"))
      .orderBy(col("cell"))
  }

  /** DuckDB twin: the shared codebook replay, top-[[IVF_ASSIGN]] cells
    * per vector, same ledger ratios. */
  lazy val annCellBalanceSql: String =
    "WITH " + (ivfCodebookCtes ++ Seq(
      s"cba AS (SELECT cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM sc) WHERE rn <= $IVF_ASSIGN)",
      "cbc AS (SELECT cell, count(*) AS n_postings FROM cba GROUP BY 1)",
      "cbt AS (SELECT CAST(sum(n_postings) AS BIGINT) AS tot, count(*) AS nc FROM cbc)"
    )).mkString(",\n") +
      """
        |SELECT cell, CAST(n_postings AS BIGINT) AS n_postings,
        |  1000000 * n_postings // tot AS share_ppm,
        |  1000000 * n_postings // tot - 1000000 // nc AS dev_ppm,
        |  CAST(CASE WHEN n_postings * nc > 2 * tot THEN 1 ELSE 0 END AS BIGINT) AS hot
        |FROM cbc CROSS JOIN cbt ORDER BY cell""".stripMargin

  def dqEmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir))
    val best = e.map { case (id, v) =>
      val n = math.sqrt(dotd(v, v))
      var bc = -1L; var bcos = Double.MinValue
      codebook.value.foreach { case (cid, cv, cn) =>
        val cos = dotd(v, cv) / (n * cn)
        if (cos > bcos || (cos == bcos && cid < bc)) { bcos = cos; bc = cid }
      }
      (id % 2, bc)
    }.toDF("half", "cell")
    val cnt = best.groupBy(col("cell"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
    // totals as window sums over the O(CELLS) ledger — one fact scan,
    // no second aggregate over the corpus-sized base (plan-pinned)
    cnt
      .withColumn("tr", expr("sum(n_ref) over ()"))
      .withColumn("tc", expr("sum(n_cur) over ()"))
      .select(col("cell"), col("n_ref"), col("n_cur"),
        expr("(1000000 * n_ref) div tr").as("ref_ppm"),
        expr("(1000000 * n_cur) div tc").as("cur_ppm"))
      .withColumn("delta_ppm", abs(col("ref_ppm") - col("cur_ppm")))
      .withColumn("tvd_ppm", expr("sum(delta_ppm) over () div 2"))
      .orderBy(col("cell"))
  }

  /** DuckDB twin: the shared codebook replay's best-cell table split
    * by vec_id parity, the same ppm occupancy compare. */
  lazy val dqEmbeddingDriftSql: String =
    "WITH " + (ivfCodebookCtes ++ Seq(
      "edb AS (SELECT vec_id, cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM sc) WHERE rn = 1)",
      "edh AS (SELECT vec_id % 2 AS half, cell FROM edb)",
      "edc AS (SELECT cell, CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur FROM edh GROUP BY 1)",
      "edt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr, CAST(sum(n_cur) AS BIGINT) AS tc FROM edc)",
      "edp AS (SELECT cell, n_ref, n_cur, CAST((1000000 * n_ref) // tr AS BIGINT) AS ref_ppm, CAST((1000000 * n_cur) // tc AS BIGINT) AS cur_ppm FROM edc CROSS JOIN edt)"
    )).mkString(",\n") +
      """
        |SELECT cell, n_ref, n_cur, ref_ppm, cur_ppm,
        |  abs(ref_ppm - cur_ppm) AS delta_ppm,
        |  CAST(sum(abs(ref_ppm - cur_ppm)) OVER () // 2 AS BIGINT) AS tvd_ppm
        |FROM edp ORDER BY cell""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ood" -> annOod,
    "dq_embedding_drift" -> dqEmbeddingDrift,
    "ann_knn_graph" -> annKnnGraph,
    "ann_knn_descent" -> annKnnDescent,
    "ann_graph_upsert" -> annGraphUpsert,
    "ann_graph_search" -> annGraphSearch,
    "ann_graph_recall_curve" -> annGraphRecallCurve,
    "ann_recall_curve" -> annRecallCurve,
    "ann_probe_plan" -> annProbePlan,
    "ann_beam_plan" -> annBeamPlan,
    "ann_cells_curve" -> annCellsCurve,
    "ann_cells_plan" -> annCellsPlan,
    "ann_filtered_search" -> annFilteredSearch,
    "ann_hard_negatives" -> annHardNegatives,
    "corpus_semdedup" -> corpusSemdedup,
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "ann_ivf_indexed" -> annIvfIndexed,
    "ann_index_upsert" -> annIndexUpsert,
    "ann_pq" -> annPq,
    "ann_ivf_pq" -> annIvfPq,
    "ann_recall_eval" -> annRecallEval,
    "dedup_embedding_ivf" -> dedupEmbeddingIvf,
    "ann_cell_balance" -> annCellBalance,
    "dedup_embedding_ivf_curve" -> dedupEmbeddingIvfCurve)

  /** DuckDB twin of the brute-force path: the dot product is a
    * sequential left-fold over per-element double products — the same
    * association order as FloatVectorDot, so cosines are bit-identical
    * and ranks match exactly.
    */
  val annBruteforceSql: String =
    """WITH e AS (SELECT vec_id, embedding, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), (acc, v) -> acc + v)) AS nrm FROM embeddings),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(q.embedding)+1), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), (acc, v) -> acc + v) / (q.nrm * c.nrm) AS cosine
      |  FROM e q, e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)
      |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of the LSH path: the plane components are the same
    * deterministic integer formula cast to REAL, the bucket bits the
    * same strict-positive dot signs, so buckets — and therefore the
    * candidate sets, cosines, and ranks — are bit-identical.
    */
  val annLshSql: String =
    """WITH e AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), (acc, v) -> acc + v)) AS nrm
      |  FROM embeddings),
      |planes AS (SELECT j, list_transform(range(0,64), d -> CAST(CAST((j*73 + d*179) % 97 AS DOUBLE)/97.0 - 0.5 AS REAL)) AS p
      |  FROM range(0,8) t(j)),
      |bits AS (SELECT e.vec_id, pl.j,
      |  CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(pl.p[i] AS DOUBLE))), (acc, v) -> acc + v) > 0
      |       THEN CAST(1 AS BIGINT) << pl.j ELSE 0 END AS bit
      |  FROM e CROSS JOIN planes pl),
      |bk AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(q.embedding)+1), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), (acc, v) -> acc + v) / (q.nrm * c.nrm) AS cosine
      |  FROM e q JOIN bk qb ON qb.vec_id = q.vec_id
      |  JOIN bk cb ON cb.bucket = qb.bucket
      |  JOIN e c ON c.vec_id = cb.vec_id
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)
      |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of the FULL trained-IVF pipeline. The four Lloyd
    * iterations are UNROLLED into chained CTEs (b0 → b1 → … → b4) —
    * DuckDB's recursive CTEs can't correlate the carried codebook at
    * depth > 1, but the iteration count is a compile-time constant, so
    * generating one CTE block per iteration replays the training
    * exactly: argmax assignment (cosine desc, cid tiebreak) as a
    * windowed rank, fixed-point unit-vector sums as exact BIGINT
    * arithmetic (Scala's math.round(x) = floor(x + 0.5) spelled
    * explicitly), centroid refresh as the identical double-division
    * chain cast to REAL, emptied cells keeping their previous centroid
    * via the LEFT JOIN COALESCE. Every cosine is the same sequential
    * left-fold as [[graft.functions.FloatVectorDot]], so the trained
    * codebook, cell assignments, probes, candidate set, cosines, and
    * ranks are all bit-identical — a full hash oracle for an operator
    * whose output depends on trained model state.
    */
  private def ivfFold(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"

  /** The k-means-replay CTE chain shared by every IVF oracle: codebook
    * training unrolled per iteration, then the final assignment rank
    * `rk` and the redundant top-[[IVF_ASSIGN]] cell index `asg`.
    */
  /** The k-means-replay chain, parameterized by cell count with every
    * CTE name prefixed — so three differently-sized codebooks can be
    * replayed side by side in one statement (the curve oracle).
    */
  private def ivfCodebookCtesAt(p: String, cells: Int): Seq[String] = {
    def fold(a: String, b: String): String = ivfFold(a, b)
    val base = Seq(
      s"${p}n AS (SELECT vec_id, embedding, sqrt(${fold("embedding", "embedding")}) AS nrm FROM embeddings)",
      s"${p}b0 AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < $cells)")
    val iters = (1 to IVF_ITERS).flatMap { it =>
      val pv = it - 1
      Seq(
        s"${p}bn$it AS (SELECT cid, cv, sqrt(${fold("cv", "cv")}) AS cn FROM ${p}b$pv)",
        s"${p}sc$it AS (SELECT n.vec_id, b.cid, ${fold("n.embedding", "b.cv")} / (n.nrm * b.cn) AS cos FROM ${p}n n CROSS JOIN ${p}bn$it b)",
        s"${p}a$it AS (SELECT s.vec_id, s.cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM ${p}sc$it) s WHERE s.rn = 1)",
        s"${p}c$it AS (SELECT cell, count(*) AS cnt FROM ${p}a$it GROUP BY cell)",
        s"${p}f$it AS (SELECT a.cell, t.d, sum(CAST(floor(CAST(n.embedding[t.d] AS DOUBLE) / n.nrm * 1e6 + 0.5) AS BIGINT)) AS s FROM ${p}a$it a JOIN ${p}n n ON n.vec_id = a.vec_id CROSS JOIN range(1, $DIM + 1) t(d) GROUP BY a.cell, t.d)",
        s"${p}m$it AS (SELECT f.cell, list(CAST(CAST(f.s AS DOUBLE) / 1e6 / c.cnt AS REAL) ORDER BY f.d) AS cv FROM ${p}f$it f JOIN ${p}c$it c ON c.cell = f.cell GROUP BY f.cell)",
        s"${p}b$it AS (SELECT b.cid, COALESCE(m.cv, b.cv) AS cv FROM ${p}b$pv b LEFT JOIN ${p}m$it m ON m.cell = b.cid)")
    }
    val index = Seq(
      s"${p}bk AS (SELECT cid, cv, sqrt(${fold("cv", "cv")}) AS cn FROM ${p}b$IVF_ITERS)",
      s"${p}sc AS (SELECT n.vec_id, b.cid, ${fold("n.embedding", "b.cv")} / (n.nrm * b.cn) AS cos FROM ${p}n n CROSS JOIN ${p}bk b)",
      s"${p}rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM ${p}sc)",
      s"${p}asg AS (SELECT vec_id, cid AS cell FROM ${p}rk WHERE rn <= $IVF_ASSIGN)")
    base ++ iters ++ index
  }

  private val ivfCodebookCtes: Seq[String] = ivfCodebookCtesAt("", IVF_CELLS)

  val annIvfSql: String = {
    val search = Seq(
      s"prb AS (SELECT vec_id, cid AS cell FROM rk WHERE rn <= $IVF_NPROBE AND vec_id < $NQ)",
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM prb q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"p AS (SELECT c.query_id, c.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM cand c JOIN n nq ON nq.vec_id = c.query_id JOIN n nc ON nc.vec_id = c.neighbor_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  /** DuckDB twin of the cell-bucketed embedding dedup: the identical
    * codebook replay and assign-2 index, candidate pairs from shared
    * cells, the same sequential-fold cosine and 0.45 threshold — pair
    * set and cosines bit-identical.
    */
  val dedupEmbeddingIvfSql: String = {
    val search = Seq(
      "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b FROM asg a JOIN asg b ON b.cell = a.cell AND a.vec_id < b.vec_id)",
      s"p AS (SELECT c.vec_a, c.vec_b, ${ivfFold("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine FROM cand c JOIN n na ON na.vec_id = c.vec_a JOIN n nb ON nb.vec_id = c.vec_b)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      "\nSELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45 ORDER BY vec_a, vec_b"
  }

  /** DuckDB twin of the curve: three prefixed codebook replays (one
    * per cell count), each probed at assign 1 and 2 — the same
    * distinct candidate set, sequential-fold cosines, and 0.45 verify,
    * folded to the identical 6-row ledger.
    */
  val dedupEmbeddingIvfCurveSql: String = {
    val chains = Seq(8, 16, 32).flatMap(c => ivfCodebookCtesAt(s"c${c}_", c))
    val rows = for { c <- Seq(8, 16, 32); k <- Seq(1, 2) } yield
      s"""SELECT CAST($c AS BIGINT) AS cells, CAST($k AS BIGINT) AS assign_k,
         |  count(*) AS n_candidates,
         |  CAST(COALESCE(sum(CASE WHEN cosine >= 0.45 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
         |FROM (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${ivfFold("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
         |  FROM (SELECT vec_id, cid AS cell FROM c${c}_rk WHERE rn <= $k) a
         |  JOIN (SELECT vec_id, cid AS cell FROM c${c}_rk WHERE rn <= $k) b
         |    ON b.cell = a.cell AND a.vec_id < b.vec_id
         |  JOIN c${c}_n na ON na.vec_id = a.vec_id
         |  JOIN c${c}_n nb ON nb.vec_id = b.vec_id)""".stripMargin
    "WITH " + chains.mkString(",\n") + "\n" +
      rows.mkString("\nUNION ALL\n") + "\nORDER BY cells, assign_k"
  }

  /** DuckDB twin of the upsert ledger: the shared codebook replay's
    * assign-2 index rolled up with the same modular batch split. */
  val annIndexUpsertSql: String =
    "WITH " + ivfCodebookCtes.mkString(",\n") + """,
      |led AS (SELECT cell,
      |    CAST(sum(CASE WHEN vec_id % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |    CAST(sum(CASE WHEN vec_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM asg GROUP BY cell)
      |SELECT cell, n_base, n_new, n_base + n_new AS n_total,
      |  1000000 * n_new // greatest(n_base, 1) AS growth_ppm,
      |  1000000 * n_new // greatest(n_base, 1) > 500000 AS retrain_flag
      |FROM led ORDER BY cell""".stripMargin

  /** DuckDB twin of the kNN graph: [[annIvfSql]]'s probe/candidate/
    * rerank chain with the query restriction removed — every vector
    * probes its top-[[IVF_NPROBE]] trained cells. */
  val annKnnGraphSql: String = {
    val search = Seq(
      s"prb AS (SELECT vec_id, cid AS cell FROM rk WHERE rn <= $IVF_NPROBE)",
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM prb q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"p AS (SELECT c.query_id, c.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM cand c JOIN n nq ON nq.vec_id = c.query_id JOIN n nc ON nc.vec_id = c.neighbor_id)",
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $K ORDER BY query_id, rank"
  }

  /** DuckDB twin of the NN-descent build: the codebook replay's
    * assign-2 index feeds the same (cell, position) ring seeds, then
    * [[ND_ROUNDS]] refinement rounds unroll as CTEs (the tokenize_bpe
    * / graph_kcore convention) — capped reverse edges, undirected
    * neighbor-of-neighbor candidates, the identical sequential-fold
    * cosine, top-[[K]] cut per round. Edge set, cosines, and ranks
    * bit-identical.
    */
  val annKnnDescentSql: String = {
    // MATERIALIZED pins: DuckDB inlines CTEs by default, so every
    // reference to `n`/`asg` would re-expand the whole codebook chain
    // and re-open the parquet (measured: EMFILE at 3 rounds).
    def sc(candCte: String, out: String): String =
      s"$out AS (SELECT c.src, c.dst, ${ivfFold("ns.embedding", "nd.embedding")} / (ns.nrm * nd.nrm) AS cosine" +
        s" FROM $candCte c JOIN ndn ns ON ns.vec_id = c.src JOIN ndn nd ON nd.vec_id = c.dst)"
    val seed = Seq(
      "ndn AS MATERIALIZED (SELECT vec_id, embedding, nrm FROM n)",
      "ndpos AS (SELECT vec_id, cell, CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS BIGINT) AS pos," +
        " count(*) OVER (PARTITION BY cell) AS csize FROM (SELECT vec_id, cell FROM asg))",
      s"ndsd AS (SELECT DISTINCT p.vec_id AS src, q.vec_id AS dst FROM ndpos p" +
        s" JOIN range(1, ${ND_K + 1}) t(j) ON t.j < p.csize" +
        s" JOIN ndpos q ON q.cell = p.cell AND q.pos = (p.pos + t.j) % p.csize)",
      sc("ndsd", "nds0"),
      s"ndg0 AS MATERIALIZED (SELECT src, dst, cosine, CAST(1 AS BIGINT) AS fresh FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn FROM nds0) WHERE rn <= $ND_K)")
    val rounds = (1 to ND_ROUNDS).flatMap { r =>
      val pv = r - 1
      Seq(
        s"ndrv$r AS (SELECT src, dst, fresh FROM (SELECT dst AS src, src AS dst, fresh, row_number() OVER (PARTITION BY dst ORDER BY cosine DESC, src) AS rn FROM ndg$pv) WHERE rn <= $ND_K)",
        s"ndu$r AS (SELECT src, dst, max(fresh) AS fresh FROM (SELECT src, dst, fresh FROM ndg$pv UNION ALL SELECT src, dst, fresh FROM ndrv$r) GROUP BY src, dst)",
        s"ndc$r AS (SELECT DISTINCT a.src, b.dst FROM ndu$r a JOIN ndu$r b ON b.src = a.dst AND b.dst <> a.src AND (a.fresh = 1 OR b.fresh = 1))",
        sc(s"ndc$r", s"nds$r"),
        s"ndm$r AS (SELECT src, dst, cosine FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn FROM" +
          s" (SELECT src, dst, cosine FROM ndg$pv UNION SELECT src, dst, cosine FROM nds$r)) WHERE rn <= $ND_K)",
        s"ndg$r AS MATERIALIZED (SELECT m.src, m.dst, m.cosine, CAST(CASE WHEN p.src IS NULL THEN 1 ELSE 0 END AS BIGINT) AS fresh" +
          s" FROM ndm$r m LEFT JOIN ndg$pv p ON p.src = m.src AND p.dst = m.dst)")
    }
    "WITH " + (ivfCodebookCtes ++ seed ++ rounds).mkString(",\n") +
      s"""
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT src AS query_id, dst AS neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS BIGINT) AS rank
         |  FROM ndg$ND_ROUNDS) WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of the graph-upsert ledger. The oracle builds the
    * FULL rebuilt graph and the base-restricted graph from the shared
    * codebook replay, then diffs — so the driver's hash check on the
    * digest IS the upsert ≡ rebuild proof (the Spark side never
    * rebuilds; its digest comes from the delta-maintained edges). */
  val annGraphUpsertSql: String = {
    val pre = Seq(
      "un AS MATERIALIZED (SELECT vec_id, embedding, nrm FROM n)",
      "urk AS MATERIALIZED (SELECT vec_id, cid, rn FROM rk)",
      "uasg AS MATERIALIZED (SELECT vec_id, cell FROM asg)",
      s"prbf AS (SELECT vec_id, cid AS cell FROM urk WHERE rn <= $IVF_NPROBE)",
      "candf AS (SELECT DISTINCT q.vec_id AS src, a.vec_id AS dst FROM prbf q JOIN uasg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"pf AS (SELECT c.src, c.dst, ${ivfFold("ns.embedding", "nd.embedding")} / (ns.nrm * nd.nrm) AS cosine FROM candf c JOIN un ns ON ns.vec_id = c.src JOIN un nd ON nd.vec_id = c.dst)",
      s"fg AS MATERIALIZED (SELECT src, dst, CAST(rn AS BIGINT) AS rank FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn FROM pf) WHERE rn <= $K)",
      s"prbb AS (SELECT vec_id, cid AS cell FROM urk WHERE rn <= $IVF_NPROBE AND vec_id % 5 <> 4)",
      "candb AS (SELECT DISTINCT q.vec_id AS src, a.vec_id AS dst FROM prbb q JOIN (SELECT vec_id, cell FROM uasg WHERE vec_id % 5 <> 4) a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"pb AS (SELECT c.src, c.dst, ${ivfFold("ns.embedding", "nd.embedding")} / (ns.nrm * nd.nrm) AS cosine FROM candb c JOIN un ns ON ns.vec_id = c.src JOIN un nd ON nd.vec_id = c.dst)",
      s"bg AS MATERIALIZED (SELECT src, dst FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn FROM pb) WHERE rn <= $K)",
      """cls AS MATERIALIZED (SELECT COALESCE(f.src, b.src) AS src,
        |    COALESCE(f.dst, b.dst) AS dst, f.rank AS f_rank,
        |    f.src IS NOT NULL AS in_f, b.src IS NOT NULL AS in_b
        |  FROM fg f FULL JOIN bg b ON b.src = f.src AND b.dst = f.dst)""".stripMargin)
    "WITH " + (ivfCodebookCtes ++ pre).mkString(",\n") + """
      |SELECT
      |  (SELECT count(DISTINCT src) FROM bg) AS n_base_nodes,
      |  (SELECT count(DISTINCT src) FROM fg WHERE src % 5 = 4) AS n_new_nodes,
      |  (SELECT count(DISTINCT src) FROM cls
      |    WHERE src % 5 <> 4 AND (NOT in_b OR NOT in_f)) AS n_affected,
      |  CAST(sum(CASE WHEN in_b AND in_f THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN in_f AND NOT in_b AND src % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN in_b AND NOT in_f THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN in_f AND src % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new_edges,
      |  CAST(sum(CASE WHEN in_f
      |    THEN ((src * 131071 + dst) * (f_rank + 1)) % 1000000007
      |    ELSE 0 END) AS BIGINT) AS graph_digest
      |FROM cls""".stripMargin
  }

  /** DuckDB twin of the graph-walk search: the [[annKnnGraphSql]]
    * edge chain (MATERIALIZED — several beam rounds read it), probe-1
    * seeds, then the fixed [[GS_ROUNDS]] beam recurrence unrolled CTE
    * by CTE (score → top-[[GS_BEAM]] → expand ∪ visited), final exact
    * rank over the last visited set — ids, cosines, ranks
    * bit-identical.
    */
  val annGraphSearchSql: String = {
    // gn/grk/gasg re-expose the codebook replay MATERIALIZED: the beam
    // recurrence references its upstream CTEs once per round, and
    // DuckDB would otherwise re-inline (and re-run) the whole k-means
    // chain per reference — the same exponential-re-evaluation trap the
    // recall-curve oracle documents. Every CTE the rounds fan into is
    // materialized, so each stage runs exactly once.
    val pre = Seq(
      "gn AS MATERIALIZED (SELECT vec_id, embedding, nrm FROM n)",
      "grk AS MATERIALIZED (SELECT vec_id, cid, rn FROM rk)",
      "gasg AS MATERIALIZED (SELECT vec_id, cell FROM asg)",
      s"gprb AS (SELECT vec_id, cid AS cell FROM grk WHERE rn <= $IVF_NPROBE)",
      "gcand AS (SELECT DISTINCT q.vec_id AS src, a.vec_id AS dst FROM gprb q JOIN gasg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"gsc AS MATERIALIZED (SELECT c.src, c.dst, ${ivfFold("ns.embedding", "nd.embedding")} / (ns.nrm * nd.nrm) AS cos FROM gcand c JOIN gn ns ON ns.vec_id = c.src JOIN gn nd ON nd.vec_id = c.dst)",
      s"g AS MATERIALIZED (SELECT src, dst FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gsc) WHERE rn <= $K)",
      s"sprb AS (SELECT vec_id, cid AS cell FROM grk WHERE rn <= $GS_SEED_PROBE AND vec_id < $NQ)",
      "v0 AS MATERIALIZED (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM sprb q JOIN gasg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)")
    val rounds = (1 to GS_ROUNDS).flatMap { t =>
      val pv = t - 1
      Seq(
        s"gs$pv AS MATERIALIZED (SELECT v.query_id, v.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM v$pv v JOIN gn nq ON nq.vec_id = v.query_id JOIN gn nc ON nc.vec_id = v.neighbor_id)",
        s"gb$pv AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM gs$pv) WHERE rn <= $GS_BEAM)",
        s"v$t AS MATERIALIZED (SELECT query_id, neighbor_id FROM v$pv UNION SELECT b.query_id, g.dst FROM gb$pv b JOIN g ON g.src = b.neighbor_id WHERE g.dst <> b.query_id)")
    }
    val fin = Seq(
      s"gsf AS (SELECT v.query_id, v.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM v$GS_ROUNDS v JOIN gn nq ON nq.vec_id = v.query_id JOIN gn nc ON nc.vec_id = v.neighbor_id)",
      "gr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM gsf)")
    "WITH " + (ivfCodebookCtes ++ pre ++ rounds ++ fin).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, cosine, rank FROM gr WHERE rank <= $K ORDER BY query_id, rank"
  }

  /** DuckDB twin of the beam curve: the shared codebook/edge chain
    * (MATERIALIZED once), then the beam recurrence unrolled per leg
    * with a `c<beam>` prefix (the [[ivfCodebookCtesAt]] prefix trick),
    * each leg's visited count + top-K hits vs the shared brute truth,
    * three rows unioned. */
  lazy val annGraphRecallCurveSql: String = {
    val pre = Seq(
      "gn AS MATERIALIZED (SELECT vec_id, embedding, nrm FROM n)",
      "grk AS MATERIALIZED (SELECT vec_id, cid, rn FROM rk)",
      "gasg AS MATERIALIZED (SELECT vec_id, cell FROM asg)",
      s"gprb AS (SELECT vec_id, cid AS cell FROM grk WHERE rn <= $IVF_NPROBE)",
      "gcand AS (SELECT DISTINCT q.vec_id AS src, a.vec_id AS dst FROM gprb q JOIN gasg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"gsc AS MATERIALIZED (SELECT c.src, c.dst, ${ivfFold("ns.embedding", "nd.embedding")} / (ns.nrm * nd.nrm) AS cos FROM gcand c JOIN gn ns ON ns.vec_id = c.src JOIN gn nd ON nd.vec_id = c.dst)",
      s"g AS MATERIALIZED (SELECT src, dst FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gsc) WHERE rn <= $K)",
      s"sprb AS (SELECT vec_id, cid AS cell FROM grk WHERE rn <= $GS_SEED_PROBE AND vec_id < $NQ)",
      "v0 AS MATERIALIZED (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM sprb q JOIN gasg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
      s"bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${ivfFold("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rank FROM gn q, gn c WHERE q.vec_id < $NQ AND q.vec_id <> c.vec_id) WHERE rank <= $K)")
    val legs = GS_CURVE_BEAMS.flatMap { b =>
      val rounds = (1 to GS_ROUNDS).flatMap { t =>
        val pv = if (t == 1) "v0" else s"c${b}v${t - 1}"
        Seq(
          s"c${b}s$t AS MATERIALIZED (SELECT v.query_id, v.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM $pv v JOIN gn nq ON nq.vec_id = v.query_id JOIN gn nc ON nc.vec_id = v.neighbor_id)",
          s"c${b}b$t AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM c${b}s$t) WHERE rn <= $b)",
          s"c${b}v$t AS MATERIALIZED (SELECT query_id, neighbor_id FROM $pv UNION SELECT x.query_id, g.dst FROM c${b}b$t x JOIN g ON g.src = x.neighbor_id WHERE g.dst <> x.query_id)")
      }
      val fin = Seq(
        s"c${b}f AS (SELECT v.query_id, v.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM c${b}v$GS_ROUNDS v JOIN gn nq ON nq.vec_id = v.query_id JOIN gn nc ON nc.vec_id = v.neighbor_id)",
        s"c${b}t AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk FROM c${b}f) WHERE rk <= $K)",
        s"c${b}r AS (SELECT CAST($b AS BIGINT) AS beam, (SELECT CAST(count(*) AS BIGINT) FROM c${b}v$GS_ROUNDS) AS n_candidates, CAST(count(*) AS BIGINT) AS n_returned, CAST(sum(CASE WHEN bt.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits FROM c${b}t t LEFT JOIN bt ON bt.query_id = t.query_id AND bt.neighbor_id = t.neighbor_id)")
      rounds ++ fin
    }
    val union = GS_CURVE_BEAMS.map(b =>
        s"SELECT beam, n_candidates, n_returned, n_hits, (1000000 * n_hits) // ${NQ.toLong * K} AS recall_ppm FROM c${b}r")
      .mkString("\nUNION ALL\n")
    "WITH " + (ivfCodebookCtes ++ pre ++ legs).mkString(",\n") +
      s"\nSELECT * FROM (\n$union\n) ORDER BY beam"
  }

  /** DuckDB twin of the probe curve: one max-probe candidate relation
    * tagged with min probe rank, four filter-configs, the brute truth
    * re-derived from the shared normalized relation. */
  val annRecallCurveSql: String = {
    // cx and bt are MATERIALIZED: each is referenced by several
    // downstream legs, and DuckDB would otherwise re-run the
    // list_reduce cosine fold per reference (measured ~10 min vs
    // seconds at sf0.01) — the same inlining trap the tokenizer
    // oracles document.
    val shared = Seq(
      s"prb AS (SELECT vec_id, cid AS cell, rn FROM rk WHERE rn <= 4 AND vec_id < $NQ)",
      "cand AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, min(q.rn) AS min_probe FROM prb q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id GROUP BY 1, 2)",
      s"cx AS MATERIALIZED (SELECT c.query_id, c.neighbor_id, c.min_probe, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM cand c JOIN n nq ON nq.vec_id = c.query_id JOIN n nc ON nc.vec_id = c.neighbor_id)",
      s"bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${ivfFold("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rank FROM n q, n c WHERE q.vec_id < $NQ AND q.vec_id <> c.vec_id) WHERE rank <= $K)",
      "cfg AS (SELECT CAST(unnest(range(1, 5)) AS BIGINT) AS nprobe)",
      "cc AS (SELECT f.nprobe, count(*) AS n_candidates FROM cfg f JOIN cx ON cx.min_probe <= f.nprobe GROUP BY 1)",
      s"tp AS (SELECT nprobe, query_id, neighbor_id FROM (SELECT f.nprobe, cx.query_id, cx.neighbor_id, row_number() OVER (PARTITION BY f.nprobe, cx.query_id ORDER BY cx.cosine DESC, cx.neighbor_id) AS rk FROM cfg f JOIN cx ON cx.min_probe <= f.nprobe) WHERE rk <= $K)",
      "scc AS (SELECT t.nprobe, count(*) AS n_returned, CAST(sum(CASE WHEN bt.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits FROM tp t LEFT JOIN bt ON bt.query_id = t.query_id AND bt.neighbor_id = t.neighbor_id GROUP BY 1)")
    "WITH " + (ivfCodebookCtes ++ shared).mkString(",\n") +
      s"""
         |SELECT cc.nprobe, cc.n_candidates, scc.n_returned, scc.n_hits,
         |  (1000000 * scc.n_hits) // ${NQ.toLong * K} AS recall_ppm
         |FROM cc JOIN scc ON scc.nprobe = cc.nprobe
         |ORDER BY cc.nprobe""".stripMargin
  }

  // ------------------------------------------------- probe planner
  /** Serving-policy planner over the measured recall curve (r17 —
    * the face that turns [[annRecallCurve]]'s eval ledger into an
    * operating decision: a serving tier doesn't read a curve, it asks
    * "what nprobe do I run for a 90 % recall SLO?"). For each recall
    * target {70, 80, 90, 95 %} the planner picks the CHEAPEST probe
    * count whose measured recall meets the target (min nprobe among
    * reached rows); an unreachable target degrades to the best
    * available recall (max recall, min nprobe tiebreak) with
    * `reached` = 0 — the honest answer when the curve tops out. The
    * ledger carries the chosen config's measured recall and its
    * candidate volume (the scan-cost the SLO buys), so the
    * recall-vs-cost trade is one row per target.
    *
    * == Scale design ==
    * The expensive part IS the curve (already a registered face,
    * bounded by queries × probes); the planning join is 4 targets ×
    * ≤4 curve rows of broadcast window math. At 100 TB the curve is
    * measured on a sampled query set and this plan is free.
    */
  def annProbePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val curve = recallCurveShared(s, dir)
      .select(col("nprobe"), col("n_candidates"), col("recall_ppm"))
    val targets = Seq(700000L, 800000L, 900000L, 950000L).toDF("target_ppm")
    val w = Window.partitionBy(col("target_ppm")).orderBy(
      (col("recall_ppm") >= col("target_ppm")).desc,
      when(col("recall_ppm") >= col("target_ppm"), col("nprobe"))
        .otherwise(lit(1000000L) - col("recall_ppm")).asc,
      col("nprobe").asc)
    broadcast(targets).crossJoin(curve)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("target_ppm"), col("nprobe"), col("recall_ppm"),
        col("n_candidates"),
        (col("recall_ppm") >= col("target_ppm")).cast("long").as("reached"))
      .orderBy(col("target_ppm"))
  }

  /** DuckDB twin: the full curve statement as a subquery, the same
    * reached-first / cheapest-probe ranking. */
  lazy val annProbePlanSql: String =
    s"""WITH curve AS (SELECT nprobe, n_candidates, recall_ppm FROM (
       |$annRecallCurveSql
       |)),
       |tg(target_ppm) AS (VALUES (700000), (800000), (900000), (950000)),
       |r AS (SELECT tg.target_ppm, c.nprobe, c.recall_ppm, c.n_candidates,
       |    CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END AS reached,
       |    row_number() OVER (PARTITION BY tg.target_ppm ORDER BY
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END DESC,
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN c.nprobe
       |        ELSE 1000000 - c.recall_ppm END ASC,
       |      c.nprobe ASC) AS rk
       |  FROM tg CROSS JOIN curve c)
       |SELECT CAST(target_ppm AS BIGINT) AS target_ppm, nprobe, recall_ppm,
       |  n_candidates, CAST(reached AS BIGINT) AS reached
       |FROM r WHERE rk = 1 ORDER BY target_ppm""".stripMargin

  // -------------------------------------------------- beam planner
  /** Serving-policy planner for the GRAPH face (r18 — the SLO symmetry
    * [[annProbePlan]] gives the IVF dial, applied to the graph walk's
    * one dial: [[annGraphRecallCurve]] measures recall-vs-cost per beam
    * over the persisted kNN graph, but no face picked the cheapest beam
    * for a recall target). For each target {70, 80, 90, 95 %} the
    * planner picks the CHEAPEST beam whose measured recall meets the
    * target (min beam among reached rows — beam IS the cost dial: the
    * visited set every walk scores in full grows with it); an
    * unreachable target degrades to the best available recall (max
    * recall, min beam tiebreak) with `reached` = 0 — the honest answer
    * when the curve tops out. The ledger carries the chosen beam's
    * measured recall and its visited-set size (`n_candidates`, the
    * exact-scoring cost the SLO buys).
    *
    * == Scale design ==
    * The expensive part IS the curve (already a registered face, three
    * query-bounded walks over the persisted edge table); the planning
    * join is 4 targets × 3 curve rows of broadcast window math. At
    * 100 TB the curve is measured on a sampled query set and this plan
    * is free.
    */
  def annBeamPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val curve = graphRecallCurveShared(s, dir)
      .select(col("beam"), col("n_candidates"), col("recall_ppm"))
    val targets = Seq(700000L, 800000L, 900000L, 950000L).toDF("target_ppm")
    val w = Window.partitionBy(col("target_ppm")).orderBy(
      (col("recall_ppm") >= col("target_ppm")).desc,
      when(col("recall_ppm") >= col("target_ppm"), col("beam"))
        .otherwise(lit(1000000L) - col("recall_ppm")).asc,
      col("beam").asc)
    broadcast(targets).crossJoin(curve)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("target_ppm"), col("beam"), col("recall_ppm"),
        col("n_candidates"),
        (col("recall_ppm") >= col("target_ppm")).cast("long").as("reached"))
      .orderBy(col("target_ppm"))
  }

  /** DuckDB twin: the full graph-curve statement as a subquery, the
    * same reached-first / cheapest-beam ranking. */
  lazy val annBeamPlanSql: String =
    s"""WITH curve AS (SELECT beam, n_candidates, recall_ppm FROM (
       |$annGraphRecallCurveSql
       |)),
       |tg(target_ppm) AS (VALUES (700000), (800000), (900000), (950000)),
       |r AS (SELECT tg.target_ppm, c.beam, c.recall_ppm, c.n_candidates,
       |    CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END AS reached,
       |    row_number() OVER (PARTITION BY tg.target_ppm ORDER BY
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END DESC,
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN c.beam
       |        ELSE 1000000 - c.recall_ppm END ASC,
       |      c.beam ASC) AS rk
       |  FROM tg CROSS JOIN curve c)
       |SELECT CAST(target_ppm AS BIGINT) AS target_ppm, beam, recall_ppm,
       |  n_candidates, CAST(reached AS BIGINT) AS reached
       |FROM r WHERE rk = 1 ORDER BY target_ppm""".stripMargin

  // ------------------------------------------------ cells tuning curve
  private val CELLS_CURVE = Seq(8, 16, 32)

  /** ANN cells-dial tuning curve (r19 — the measured face for THE dial
    * this round made a conf knob: every other ANN/dedup dial already
    * has its curve ([[annRecallCurve]] probes, [[annGraphRecallCurve]]
    * beam, [[graft.operators.Dedup.dedupLshCurve]] banding,
    * [[dedupEmbeddingIvfCurve]] the dedup (cells, assign) grid), but
    * `spark.graft.ann.cells` — the one dial that must grow ~√N at
    * corpus scale — had no search-face curve justifying its default).
    * For each codebook size ∈ {8, 16, 32}: the probe-3/assign-2 search
    * face's candidate volume (the exact reranks per query set — the
    * COST a bigger codebook divides, ≈ N·probe·assign/CELLS per query)
    * and the ppm recall of its top-[[K]] vs brute-force truth (the
    * YIELD tighter cell boundaries risk losing — the boundary-loss
    * failure mode the annIvf tuning note documents). Reading the
    * curve: recall holds roughly flat while candidates fall with
    * CELLS, which is exactly the property that makes the √N dial safe
    * to turn — measured here instead of asserted in a Scaladoc.
    *
    * == Scale design ==
    * SAMPLE-BOUND BY CONTRACT, like [[dedupEmbeddingIvfCurve]]:
    * sweeping fixed cell counts re-trains and re-assigns per config,
    * which is how parameter tuning actually runs — on a bounded sample
    * whose recall/cost statistics transfer — never on the 100 TB
    * corpus. Each leg is one assignment scan + the bucket-equality
    * join (candidates, never the cross product); truth is the bounded
    * [[NQ]]-query brute list; everything downstream of the candidate
    * join is O(NQ · K).
    */
  def annCellsCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val truth = bruteforceTruth(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val legs = CELLS_CURVE.map { c =>
      val codebook = s.sparkContext.broadcast(trainedCodebook(s, dir, c))
      def cellsOf(v: Array[Float], n: Double, k: Int): Seq[Long] =
        codebook.value
          .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
          .sortBy { case (cid, cos) => (-cos, cid) }
          .take(k).map(_._1).toSeq
      val assigned = e.flatMap { case (id, v) =>
        val n = nrm(v)
        cellsOf(v, n, IVF_ASSIGN).map(cell => (id, v, n, cell))
      }.toDF("vec_id", "embedding", "nrm", "cell")
      val probes = e.filter(_._1 < NQ).flatMap { case (id, v) =>
        val n = nrm(v)
        cellsOf(v, n, IVF_NPROBE).map(cell => (id, v, n, cell))
      }.toDF("q_id", "q_emb", "q_nrm", "cell")
      // pairs reached through both probed cells collapse here (same
      // pair ⇒ identical cosine), exactly annIvf's distinct
      val cand = broadcast(probes).join(assigned,
          probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
        .groupBy(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"))
        .agg(max(dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      val top = cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= K)
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      top.join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_returned"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .crossJoin(nCand)
        .select(lit(c.toLong).as("cells"), col("n_candidates"),
          col("n_returned"), col("n_hits"),
          expr(s"1000000 * n_hits div ${NQ.toLong * K}").as("recall_ppm"))
    }
    legs.reduce(_ unionAll _).orderBy(col("cells"))
  }

  /** DuckDB twin of the cells curve: three prefixed codebook replays
    * (the [[ivfCodebookCtesAt]] trick), each searched probe-3/assign-2,
    * one shared brute-truth relation. */
  lazy val annCellsCurveSql: String = {
    val chains = CELLS_CURVE.flatMap(c => ivfCodebookCtesAt(s"k${c}_", c))
    // bt MATERIALIZED: referenced by all three legs; DuckDB would
    // otherwise re-run the cosine fold per reference (the inlining
    // trap the curve oracles document)
    val bt =
      s"bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${ivfFold("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rank FROM k8_n q, k8_n c WHERE q.vec_id < $NQ AND q.vec_id <> c.vec_id) WHERE rank <= $K)"
    val legs = CELLS_CURVE.flatMap { c =>
      val p = s"k${c}_"
      Seq(
        s"${p}prb AS (SELECT vec_id, cid AS cell FROM ${p}rk WHERE rn <= $IVF_NPROBE AND vec_id < $NQ)",
        s"${p}cand AS (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id FROM ${p}prb q JOIN ${p}asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id)",
        s"${p}cx AS MATERIALIZED (SELECT c.query_id, c.neighbor_id, ${ivfFold("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine FROM ${p}cand c JOIN ${p}n nq ON nq.vec_id = c.query_id JOIN ${p}n nc ON nc.vec_id = c.neighbor_id)",
        s"${p}tp AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk FROM ${p}cx) WHERE rk <= $K)",
        s"${p}r AS (SELECT CAST($c AS BIGINT) AS cells, (SELECT CAST(count(*) AS BIGINT) FROM ${p}cx) AS n_candidates, CAST(count(*) AS BIGINT) AS n_returned, CAST(sum(CASE WHEN bt.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits FROM ${p}tp t LEFT JOIN bt ON bt.query_id = t.query_id AND bt.neighbor_id = t.neighbor_id)")
    }
    val union = CELLS_CURVE.map(c =>
        s"SELECT cells, n_candidates, n_returned, n_hits, (1000000 * n_hits) // ${NQ.toLong * K} AS recall_ppm FROM k${c}_r")
      .mkString("\nUNION ALL\n")
    "WITH " + (chains ++ Seq(bt) ++ legs).mkString(",\n") +
      s"\nSELECT * FROM (\n$union\n) ORDER BY cells"
  }

  // -------------------------------------------------- cells planner
  /** SLO planner for the cells dial (r19 — the [[annProbePlan]] /
    * [[annBeamPlan]] / lsh-plan symmetry applied to the codebook-size
    * dial the round made a conf knob): for each recall target
    * {70, 80, 90, 95 %} the CHEAPEST cell count whose measured
    * [[annCellsCurve]] recall meets it — cheapest by `n_candidates`,
    * the exact-rerank cost the recall buys (cost falls as cells GROW,
    * so the planner ranks by measured candidate volume, not by the
    * config id — the lsh-plan lesson). Unreachable targets degrade to
    * the best available recall (then min candidates) with
    * `reached` = 0. The pick is what a deployment sets
    * `spark.graft.ann.cells` to at THIS corpus size; re-planning on
    * the grown corpus is how the √N schedule is actually operated.
    *
    * == Scale design ==
    * The expensive part IS the curve (a registered face, sample-bound
    * by contract); the plan is 4 targets × 3 curve rows of broadcast
    * window math — free at any scale.
    */
  def annCellsPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val curve = cellsCurveShared(s, dir)
      .select(col("cells"), col("n_candidates"), col("recall_ppm"))
    val targets = Seq(700000L, 800000L, 900000L, 950000L).toDF("target_ppm")
    val w = Window.partitionBy(col("target_ppm")).orderBy(
      (col("recall_ppm") >= col("target_ppm")).desc,
      when(col("recall_ppm") >= col("target_ppm"), col("n_candidates"))
        .otherwise(lit(1000000L) - col("recall_ppm")).asc,
      col("n_candidates").asc, col("cells").asc)
    broadcast(targets).crossJoin(curve)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("target_ppm"), col("cells"), col("recall_ppm"),
        col("n_candidates"),
        (col("recall_ppm") >= col("target_ppm")).cast("long").as("reached"))
      .orderBy(col("target_ppm"))
  }

  /** DuckDB twin: the full cells-curve statement as a subquery, the
    * same reached-first / cheapest-candidates ranking. */
  lazy val annCellsPlanSql: String =
    s"""WITH curve AS (SELECT cells, n_candidates, recall_ppm FROM (
       |$annCellsCurveSql
       |)),
       |tg(target_ppm) AS (VALUES (700000), (800000), (900000), (950000)),
       |r AS (SELECT tg.target_ppm, c.cells, c.recall_ppm, c.n_candidates,
       |    CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END AS reached,
       |    row_number() OVER (PARTITION BY tg.target_ppm ORDER BY
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN 1 ELSE 0 END DESC,
       |      CASE WHEN c.recall_ppm >= tg.target_ppm THEN c.n_candidates
       |        ELSE 1000000 - c.recall_ppm END ASC,
       |      c.n_candidates ASC, c.cells ASC) AS rk
       |  FROM tg CROSS JOIN curve c)
       |SELECT CAST(target_ppm AS BIGINT) AS target_ppm, cells, recall_ppm,
       |  n_candidates, CAST(reached AS BIGINT) AS reached
       |FROM r WHERE rk = 1 ORDER BY target_ppm""".stripMargin

  /** DuckDB twin of the SemDeDup cut: [[dedupEmbeddingIvfSql]]'s pair
    * chain, dropped = distinct higher-id endpoints, ledger per label. */
  val corpusSemdedupSql: String = {
    val search = Seq(
      "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b FROM asg a JOIN asg b ON b.cell = a.cell AND a.vec_id < b.vec_id)",
      s"p AS (SELECT c.vec_a, c.vec_b, ${ivfFold("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine FROM cand c JOIN n na ON na.vec_id = c.vec_a JOIN n nb ON nb.vec_id = c.vec_b)",
      "drp AS (SELECT DISTINCT vec_b AS vec_id FROM p WHERE cosine >= 0.45)")
    "WITH " + (ivfCodebookCtes ++ search).mkString(",\n") +
      """
        |SELECT e.label, count(*) AS n_vecs,
        |  CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(count(*) - sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  (CAST(count(*) - sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS kept_ppm
        |FROM embeddings e LEFT JOIN drp d ON d.vec_id = e.vec_id
        |GROUP BY e.label ORDER BY e.label""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_knn_graph" -> annKnnGraphSql,
    "ann_knn_descent" -> annKnnDescentSql,
    "ann_graph_upsert" -> annGraphUpsertSql,
    "ann_graph_search" -> annGraphSearchSql,
    "ann_graph_recall_curve" -> annGraphRecallCurveSql,
    "ann_recall_curve" -> annRecallCurveSql,
    "ann_probe_plan" -> annProbePlanSql,
    "ann_beam_plan" -> annBeamPlanSql,
    "ann_cells_curve" -> annCellsCurveSql,
    "ann_cells_plan" -> annCellsPlanSql,
    "ann_filtered_search" -> annFilteredSearchSql,
    "ann_hard_negatives" -> annHardNegativesSql,
    "corpus_semdedup" -> corpusSemdedupSql,
    "ann_bruteforce" -> annBruteforceSql,
    "ann_index_upsert" -> annIndexUpsertSql,
    "ann_lsh" -> annLshSql,
    "ann_ivf" -> annIvfSql,
    // the index is layout, not semantics: identical result contract
    "ann_ivf_indexed" -> annIvfSql,
    "ann_pq" -> annPqSql,
    "ann_ivf_pq" -> annIvfPqSql,
    "ann_recall_eval" -> annRecallEvalSql,
    "ann_ood" -> annOodSql,
    "dq_embedding_drift" -> dqEmbeddingDriftSql,
    "dedup_embedding_ivf" -> dedupEmbeddingIvfSql,
    "ann_cell_balance" -> annCellBalanceSql,
    "dedup_embedding_ivf_curve" -> dedupEmbeddingIvfCurveSql)
}
