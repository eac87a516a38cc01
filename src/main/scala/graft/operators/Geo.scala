package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Geo / reference-pipeline operators (SURVEY.md §2, table 1).
  *
  * Re-expresses the reference map task (/root/reference/src/awsbatch-map/
  * main.py:21-96): EPSG:4326→3857 projection, NYC bounding-box filter,
  * 1400×1000 rasterization (datashader Canvas.points equivalent),
  * histogram-equalized shading (tf.shade eq_hist equivalent), and the
  * per-partition fan-out / ordered reduce of the AWS Batch array job
  * (Implementation.cs:17-80, Reduce.ps1:1-10) — all as declarative
  * DataFrame transforms.
  *
  * The testdata has no lat/lon, so a deterministic synthetic point
  * cloud is derived from `events` with pure integer Weyl-sequence
  * arithmetic — exactly reproducible in the DuckDB oracle.
  *
  * == Scale notes ==
  * Rasterization groups on a bounded key space (1.4M pixels): map-side
  * partial aggregation absorbs virtually all input rows, shuffle volume
  * is O(pixels) regardless of input size. Eq-hist ranks the raster
  * (O(pixels)), never the input. The per-day fan-out is a grouped agg +
  * tiny window — the reference's 24-way array job becomes partition
  * pruning + shuffle-free combine.
  */
object Geo {

  /** meters per degree longitude in EPSG:3857 (20037508.342789244/180). */
  private val M = 20037508.342789244 / 180.0
  /** WGS84 sphere radius: y = R·ln(tan(π/4 + φ/2)). */
  private val R = 6378137.0
  // Reference bbox (main.py x_range/y_range), Web Mercator meters.
  private val X0 = -8254332.0
  private val X1 = -8209813.5
  private val Y0 = 4965255.5
  private val Y1 = 4988769.5
  private val W = 1400
  private val H = 1000

  /** Deterministic synthetic points: integer Weyl sequences on
    * event_id → uniform lon/lat around NYC. Integer mod arithmetic is
    * exact and engine-independent; the final double ops (div, mul, add)
    * are IEEE-identical on both engines.
    */
  def points(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("ts"),
        (lit(-74.15) + (col("event_id") * 2654435761L % 100000L) / 100000.0 * 0.4).as("lon"),
        (lit(40.55) + ((col("event_id") * 1103515245L + 12345L) % 100000L) / 100000.0 * 0.35).as("lat"))

  private val pointsCte: String =
    """points AS (
      |  SELECT event_id, ts,
      |    -74.15 + (event_id * 2654435761 % 100000)/100000.0 * 0.4 AS lon,
      |    40.55 + ((event_id * 1103515245 + 12345) % 100000)/100000.0 * 0.35 AS lat
      |  FROM events)""".stripMargin

  /** EPSG:4326 → EPSG:3857: x = lon·M, y = ln(tan((90+lat)·π/360))·R,
    * rounded to cm AT THE PROJECTION so every downstream consumer
    * (bbox predicate, pixel binning, output) sees identical doubles on
    * both engines — last-ulp libm differences in tan/ln can otherwise
    * flip a bin or an edge inclusion.
    *
    * The cm round is floor(v·100 + 0.5)/100 — exact IEEE mul/add/floor
    * replicated verbatim in the oracle SQL, so parity holds by
    * construction. Spark's round(x, 2) would instead round the
    * shortest-decimal repr HALF_UP (BigDecimal) while DuckDB rounds the
    * binary double — divergent exactly on .xx5 boundaries.
    */
  private def cmRound(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100.0 + 0.5) / 100.0
  private def mercX = cmRound(col("lon") * M).as("x")
  private def mercY = cmRound(log(tan((col("lat") + 90.0) * (math.Pi / 360.0))) * R).as("y")

  private val mercCte: String =
    s"""merc AS (
       |  SELECT event_id, ts, floor((lon * $M) * 100.0 + 0.5) / 100.0 AS x,
       |    floor((ln(tan((lat + 90.0) * ${math.Pi / 360.0})) * $R) * 100.0 + 0.5) / 100.0 AS y
       |  FROM points)""".stripMargin

  def geoMercator(s: SparkSession, dir: String): DataFrame =
    points(s, dir).select(col("event_id"), mercX, mercY)
      .orderBy(col("event_id"))

  val geoMercatorSql: String =
    s"""WITH $pointsCte, $mercCte
       |SELECT event_id, x, y
       |FROM merc ORDER BY event_id""".stripMargin

  /** Bounding-box range predicate. On a real dataset with materialized
    * x/y this is a pushed-down parquet range filter; here it applies
    * right above the scan (only event_id is read).
    */
  def geoBboxFilter(s: SparkSession, dir: String): DataFrame =
    points(s, dir).select(col("event_id"), mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .orderBy(col("event_id"))

  val geoBboxFilterSql: String =
    s"""WITH $pointsCte, $mercCte
       |SELECT event_id, x, y
       |FROM merc
       |WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |ORDER BY event_id""".stripMargin

  /** Rasterize: bin points into the 1400×1000 grid and count per pixel
    * (datashader Canvas.points equivalent). Bounded key space ⇒ partial
    * agg absorbs the input map-side.
    */
  def rasterDf(s: SparkSession, dir: String): DataFrame =
    points(s, dir).select(col("event_id"), mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .select(
        least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1)).cast("long").as("px"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1)).cast("long").as("py"))
      .groupBy("px", "py").agg(count(lit(1)).as("cnt"))

  private val rasterCte: String =
    s"""raster AS (
       |  SELECT CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT) AS px,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT) AS py,
       |    count(*) AS cnt
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2)""".stripMargin

  def geoRasterize(s: SparkSession, dir: String): DataFrame =
    rasterDf(s, dir).orderBy(col("px"), col("py"))

  val geoRasterizeSql: String =
    s"""WITH $pointsCte, $mercCte, $rasterCte
       |SELECT px, py, cnt FROM raster ORDER BY px, py""".stripMargin

  /** Histogram-equalized shading (tf.shade eq_hist equivalent) as a
    * TWO-PASS HISTOGRAM, not an un-partitioned rank over the raster:
    * pass 1 reduces the raster to its count histogram (|distinct cnt|
    * rows — tiny), pass 2 derives each count's strictly-below bin total
    * from the histogram alone (a broadcast non-equi aggregation over
    * histogram×histogram), and the shade lookup broadcast-joins back
    * onto the raster. Reproduces percent_rank exactly — shade =
    * floor((below/(n_bins−1))·255), ties shade equally — but no single
    * task ever sorts O(pixels); the only O(pixels) shuffle is the
    * histogram partial-agg, and the final join is broadcast
    * (shuffle-free).
    */
  private def eqhistShade(raster: DataFrame): DataFrame = {
    val hist = raster.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val histO = hist.select(col("cnt").as("cnt_o"), col("m").as("m_o"))
    val below = hist.join(broadcast(histO), col("cnt_o") < col("cnt"), "left")
      .groupBy(col("cnt"))
      .agg(coalesce(sum(col("m_o")), lit(0L)).as("below"))
    val tot = hist.agg(sum(col("m")).as("n_bins"))
    // percent_rank = (rank−1)/(n−1) with rank = strictly-below + 1;
    // the double division/multiplication order matches Spark's
    // percent_rank and the oracle SQL bit-for-bit.
    val pr = when(col("n_bins") === 1, lit(0.0))
      .otherwise(col("below").cast("double") / (col("n_bins") - 1).cast("double"))
    val lookup = below.crossJoin(broadcast(tot))
      .select(col("cnt").as("cnt_l"), floor(pr * 255).as("shade"))
    raster.join(broadcast(lookup), col("cnt") === col("cnt_l"))
      .select(col("px"), col("py"), col("cnt"), col("shade"))
  }

  def geoShadeEqhist(s: SparkSession, dir: String): DataFrame =
    eqhistShade(rasterDf(s, dir))
      .select(col("px"), col("py"), col("cnt"), col("shade").cast("int").as("shade"))
      .orderBy(col("px"), col("py"))

  val geoShadeEqhistSql: String =
    s"""WITH $pointsCte, $mercCte, $rasterCte
       |SELECT px, py, cnt,
       |  CAST(floor(percent_rank() OVER (ORDER BY cnt) * 255) AS INT) AS shade
       |FROM raster ORDER BY px, py""".stripMargin

  /** Fire-like color ramp (black → red → yellow → white), the shape of
    * the reference's colorcet `fire` map (main.py's tf.shade cmap).
    * Piecewise-linear over the 0..255 shade with integer arithmetic —
    * identical on both engines.
    */
  def geoShadeRgb(s: SparkSession, dir: String): DataFrame = {
    def ramp(shade: org.apache.spark.sql.Column) = {
      val r = least(lit(255L), shade * 3L)
      val g = greatest(lit(0L), least(lit(255L), (shade - 85L) * 3L))
      val b = greatest(lit(0L), least(lit(255L), (shade - 170L) * 3L))
      (r, g, b)
    }
    val shaded = eqhistShade(rasterDf(s, dir))
      .select(col("px"), col("py"), col("cnt"), col("shade").cast("long").as("shade"))
    val (r, g, b) = ramp(col("shade"))
    shaded.select(col("px"), col("py"), col("shade"),
      r.as("red"), g.as("green"), b.as("blue"))
      .orderBy(col("px"), col("py"))
  }

  val geoShadeRgbSql: String =
    s"""WITH $pointsCte, $mercCte, $rasterCte,
       |shaded AS (
       |  SELECT px, py, cnt,
       |    CAST(floor(percent_rank() OVER (ORDER BY cnt) * 255) AS BIGINT) AS shade
       |  FROM raster)
       |SELECT px, py, shade,
       |  least(255, shade * 3) AS red,
       |  greatest(0, least(255, (shade - 85) * 3)) AS green,
       |  greatest(0, least(255, (shade - 170) * 3)) AS blue
       |FROM shaded ORDER BY px, py""".stripMargin

  /** Spread pass over the shaded raster (r14 wave 25 — datashader's
    * `tf.spread` step, the one visual-pipeline stage between shade and
    * export the inventory lacked: single-pixel points are invisible at
    * display resolution, so each occupied cell's count is spread over
    * its 3×3 neighborhood before export). Implemented as a 9-offset
    * fan-out of the OCCUPIED raster cells (a convolution with the ones
    * kernel) clipped at the canvas edges, then a grouped re-sum per
    * target cell — `cnt_spread` = Σ neighbor counts, `n_src` = how
    * many occupied neighbors contributed, and the original `cnt`
    * rides along (0 where spread lit a previously-empty cell).
    * Interior mass conservation — every count lands in exactly 9
    * cells unless clipped — is what the spec pins.
    *
    * == Scale design ==
    * The fan-out rides the RASTER relation (canvas-bounded, ≤1.4M
    * cells, already reduced map-side from the point corpus), never the
    * points: ×9 of bounded is bounded. The re-sum is one
    * map-side-combinable groupBy on grid keys; the original-count
    * join-back is grid-keyed and canvas-bounded on both sides.
    */
  def geoSpread(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val raster = rasterDf(s, dir).stableCheckpoint()
    val offs = (for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))).toSeq
    val sp = raster.select(col("px"), col("py"), col("cnt"),
        explode(array(offs: _*)).as("o"))
      .select((col("px") + col("o.dx")).as("qx"),
        (col("py") + col("o.dy")).as("qy"), col("cnt"))
      .filter(col("qx") >= 0 && col("qx") <= (W - 1) &&
        col("qy") >= 0 && col("qy") <= (H - 1))
      .groupBy(col("qx"), col("qy"))
      .agg(count(lit(1)).as("n_src"), sum(col("cnt")).as("cnt_spread"))
    sp.join(raster.select(col("px"), col("py"), col("cnt")),
        col("px") === col("qx") && col("py") === col("qy"), "left_outer")
      .select(col("qx").as("px"), col("qy").as("py"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        col("n_src"), col("cnt_spread"))
      .orderBy(col("px"), col("py"))
  }

  val geoSpreadSql: String =
    s"""WITH $pointsCte, $mercCte, $rasterCte,
       |off AS (SELECT o1.d AS dx, o2.d AS dy
       |  FROM (SELECT unnest(range(-1, 2)) AS d) o1
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) o2),
       |sp AS (SELECT px + dx AS qx, py + dy AS qy, cnt
       |  FROM raster CROSS JOIN off
       |  WHERE px + dx BETWEEN 0 AND ${W - 1}
       |    AND py + dy BETWEEN 0 AND ${H - 1}),
       |agg AS (SELECT qx, qy, count(*) AS n_src,
       |    CAST(sum(cnt) AS BIGINT) AS cnt_spread
       |  FROM sp GROUP BY 1, 2)
       |SELECT a.qx AS px, a.qy AS py,
       |  COALESCE(r.cnt, 0) AS cnt, a.n_src, a.cnt_spread
       |FROM agg a LEFT JOIN raster r ON r.px = a.qx AND r.py = a.qy
       |ORDER BY px, py""".stripMargin

  /** Per-partition (day) fan-out: one frame-summary row per day of
    * in-bbox points, with an ordered frame sequence — the Spark-native
    * equivalent of the reference's per-month AWS Batch array job
    * (Implementation.cs:41-57): partitions become group keys, the array
    * index becomes row_number over the partition order.
    */
  def mapFanout(s: SparkSession, dir: String): DataFrame = {
    val frames = points(s, dir).select(col("event_id"), col("ts"), mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("frame_day"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("event_id") % 997L).as("checksum"))
    frames
      .withColumn("frame_seq", row_number().over(Window.orderBy(col("frame_day"))).cast("long"))
      .select(col("frame_seq"), col("frame_day"), col("n_points"), col("checksum"))
      .orderBy(col("frame_seq"))
  }

  val mapFanoutSql: String =
    s"""WITH $pointsCte, $mercCte,
       |frames AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS frame_day, count(*) AS n_points,
       |    CAST(sum(event_id % 997) AS BIGINT) AS checksum
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY frame_day) AS BIGINT) AS frame_seq,
       |  frame_day, n_points, checksum
       |FROM frames ORDER BY frame_seq""".stripMargin

  /** Frame-over-frame raster churn (r16) — the temporal-diff face of
    * the animation pipeline ([[mapFanout]] plans the frames,
    * [[reduceAssemble]] sequences them; this measures what actually
    * CHANGES between consecutive frames, the signal an animation
    * pipeline reads to pick frame rate and to skip near-identical
    * frames): per frame day, against the PREVIOUS calendar day's
    * raster — lit cells now/before, newly-lit cells, extinguished
    * cells, signed point-mass delta, and cell churn in exact ppm over
    * the two frames' cell union. The corpus's first frame is
    * all-new by contract (n_prev = 0, churn 10⁶).
    *
    * == Scale design ==
    * ONE corpus scan folds map-side onto the bounded (day, px, py)
    * lit-cell relation (≤ days × 1.4M, checkpointed — consumed twice
    * as current and day-shifted previous); the frame pair is a
    * full-outer join ON that bounded relation, never the points; the
    * ledger is O(days).
    */
  /** Per-day lit-cell relation (dkey, px, py, cnt) — ONE corpus scan
    * folded map-side onto the bounded grid, checkpointed. Shared by
    * [[geoFrameChurn]], the `stream_frame_churn` batch face and its
    * MemoryStream spec feed.
    */
  private[graft] def dayRaster(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    points(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("dkey"),
        col("ts"), mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .select(col("dkey"),
        least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1)).cast("long").as("px"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1)).cast("long").as("py"))
      .groupBy(col("dkey"), col("px"), col("py")).agg(count(lit(1)).as("cnt"))
      .stableCheckpoint()
  }

  /** The day-keyed churn ledger over [[dayRaster]] — the epoch-day
    * relation both churn faces share (the batch key formats the date
    * on top; the streaming face consumes the long, per the feed's-own-
    * key convention).
    */
  private[graft] def frameChurnLedger(s: SparkSession, dir: String): DataFrame = {
    val r = dayRaster(s, dir)
    val cur = r.select(col("dkey"), col("px"), col("py"), col("cnt").as("c_cnt"))
    val prev = r.select((col("dkey") + 1).as("dkey"), col("px"), col("py"),
      col("cnt").as("p_cnt"))
    val days = r.select(col("dkey")).distinct()
    cur.join(prev, Seq("dkey", "px", "py"), "full_outer")
      .join(days, Seq("dkey"), "left_semi")
      .groupBy(col("dkey"))
      .agg(count(col("c_cnt")).as("n_cur"), count(col("p_cnt")).as("n_prev"),
        sum(when(col("c_cnt").isNotNull && col("p_cnt").isNull, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("p_cnt").isNotNull && col("c_cnt").isNull, 1L).otherwise(0L))
          .as("n_dead"),
        (coalesce(sum(col("c_cnt")), lit(0L)) - coalesce(sum(col("p_cnt")), lit(0L)))
          .as("mass_delta"))
      .withColumn("churn_ppm",
        expr("1000000 * (n_new + n_dead) div (n_prev + n_new)"))
  }

  def geoFrameChurn(s: SparkSession, dir: String): DataFrame =
    frameChurnLedger(s, dir)
      .select(col("dkey").as("day"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(dkey AS INT)), 'yyyy-MM-dd')")
          .as("frame_day"),
        col("n_cur"), col("n_prev"), col("n_new"), col("n_dead"), col("mass_delta"),
        col("churn_ppm"))
      .orderBy(col("day"))

  /** Shared churn-ledger CTE chain (points → merc → per-day raster →
    * day-shifted full-outer pair → O(days) ledger). */
  /** points → merc → per-(day, px, py) raster-cell CTE prefix (no WITH
    * keyword) — the [[dayRaster]] relation's oracle replay, shared by
    * the churn faces and [[Maintain.shuffleBudget]] so the raster
    * shuffle relation is counted by the exact binning the family runs.
    */
  private[graft] val rasterCellsCtes: String =
    s"""$pointsCte, $mercCte,
       |dr AS (
       |  SELECT epoch_us(ts) // 86400000000 AS dkey,
       |    CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT) AS px,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT) AS py,
       |    count(*) AS cnt
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2, 3)""".stripMargin

  private val frameChurnCtes: String =
    s"""WITH $rasterCellsCtes,
       |j AS (
       |  SELECT COALESCE(c.dkey, p.dkey + 1) AS dkey,
       |    c.cnt AS c_cnt, p.cnt AS p_cnt
       |  FROM dr c FULL JOIN dr p
       |    ON p.dkey + 1 = c.dkey AND p.px = c.px AND p.py = c.py),
       |led AS (
       |  SELECT dkey, count(c_cnt) AS n_cur, count(p_cnt) AS n_prev,
       |    CAST(sum(CASE WHEN c_cnt IS NOT NULL AND p_cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |    CAST(sum(CASE WHEN p_cnt IS NOT NULL AND c_cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
       |    CAST(COALESCE(sum(c_cnt), 0) - COALESCE(sum(p_cnt), 0) AS BIGINT) AS mass_delta
       |  FROM j WHERE dkey IN (SELECT DISTINCT dkey FROM dr)
       |  GROUP BY 1)""".stripMargin

  /** DuckDB twin: the shared point/merc CTEs, the per-day raster, the
    * day-shifted full-outer pair, the same O(days) ledger. */
  val geoFrameChurnSql: String =
    s"""$frameChurnCtes
       |SELECT CAST(dkey AS BIGINT) AS day,
       |  strftime(DATE '1970-01-01' + CAST(dkey AS INT), '%Y-%m-%d') AS frame_day,
       |  n_cur, n_prev, n_new, n_dead, mass_delta,
       |  1000000 * (n_new + n_dead) // (n_prev + n_new) AS churn_ppm
       |FROM led ORDER BY day""".stripMargin

  /** The ledger as the streaming face consumes it: epoch-day long key,
    * no date formatting (the `stream_frame_churn` oracle). */
  private[graft] val frameChurnDaysSql: String =
    s"""$frameChurnCtes
       |SELECT CAST(dkey AS BIGINT) AS day,
       |  n_cur, n_prev, n_new, n_dead, mass_delta,
       |  1000000 * (n_new + n_dead) // (n_prev + n_new) AS churn_ppm
       |FROM led ORDER BY day""".stripMargin

  /** Ordered reduce: assemble the frame manifest the encoder would
    * consume (Reduce.ps1's ffmpeg step, encode itself stubbed as
    * out-of-scope I/O): cumulative point offsets, total frame count,
    * and the 2-fps presentation timestamp.
    */
  def reduceAssemble(s: SparkSession, dir: String): DataFrame = {
    val frames = mapFanout(s, dir)
    val wRun = Window.orderBy(col("frame_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .select(col("frame_seq"), col("frame_day"), col("n_points"),
        sum(col("n_points")).over(wRun).as("cum_points"),
        count(lit(1)).over(Window.partitionBy()).as("total_frames"),
        ((col("frame_seq") - 1) / 2.0).as("pts_sec"))
      .orderBy(col("frame_seq"))
  }

  val reduceAssembleSql: String =
    s"""WITH $pointsCte, $mercCte,
       |frames AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS frame_day, count(*) AS n_points,
       |    CAST(sum(event_id % 997) AS BIGINT) AS checksum
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1),
       |seq AS (
       |  SELECT CAST(row_number() OVER (ORDER BY frame_day) AS BIGINT) AS frame_seq,
       |    frame_day, n_points FROM frames)
       |SELECT frame_seq, frame_day, n_points,
       |  CAST(sum(n_points) OVER (ORDER BY frame_seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_points,
       |  count(*) OVER () AS total_frames,
       |  (frame_seq - 1) / 2.0 AS pts_sec
       |FROM seq ORDER BY frame_seq""".stripMargin

  // ------------------------------------------- composed frame build
  /** The composed per-frame render (r17) — the reference's actual unit
    * of work (/root/reference/src/awsbatch-map/main.py:21-96: one
    * month → read → normalize → project → filter → rasterize → shade →
    * PNG) as ONE registered key with marginal stage accounting, the
    * [[graft.operators.Multimodal.pipelineMediaBuild]] pattern applied
    * to the Geo family. Every stage is a registered face's rule; this
    * face chains them PER FRAME DAY and emits the frame ledger:
    *
    *   1. ingest — all points of the frame day (`n_points`).
    *   2. bbox cut — [[geoBboxFilter]]'s predicate (`n_bbox`
    *      survivors; the marginal `n_points − n_bbox` is the cut).
    *   3. rasterize — [[geoRasterize]]'s binning per day (`n_lit`
    *      cells; Σ cell counts = `n_bbox` by construction).
    *   4. spread — [[geoSpread]]'s 3×3 ones-kernel convolution on the
    *      day's raster (`n_spread` cells, `spread_mass`).
    *   5. shade + RGB — [[geoShadeEqhist]]'s two-pass histogram
    *      eq-hist over the day's SPREAD counts (per-frame
    *      normalization, exactly datashader's per-image eq_hist) and
    *      [[geoShadeRgb]]'s fire ramp, reduced to `shade_mass` and an
    *      order-independent exact `rgb_digest` (Σ of a per-pixel
    *      integer mix mod 1e9+7) — the frame-level checksum an encode
    *      step would consume.
    *
    * == Scale design ==
    * ONE corpus scan folds map-side onto the bounded (day, px, py)
    * relation — out-of-bbox rows fold to the (−1,−1) overflow cell so
    * the stage-1/2 marginals read off the SAME bounded relation
    * (checkpointed; ≤ days × (1.4M + 1) rows). The spread fan-out,
    * per-frame histogram (days × |distinct counts|), shade lookup and
    * ledger are all canvas-bounded; no stage past the scan touches
    * point volume, and the per-day partitioning is embarrassingly
    * parallel across frames — the reference's 24-way array job as
    * group keys.
    */
  /** Shared per-frame render: stages [4-5] of [[pipelineFrameBuild]] —
    * 3×3 spread + per-frame eq-hist + fire-ramp RGB, reduced to the
    * frame ledger (n_spread, spread_mass, shade_mass, rgb_digest).
    * Factored out so [[pipelineFrameIncremental]] can push its before/
    * after legs through the IDENTICAL arithmetic. The eq-hist is
    * [[eqhistShade]]'s two-pass histogram with the frame day joined
    * into every key: percent_rank = cells-strictly-below / (cells − 1)
    * per frame, DuckDB's `percent_rank() OVER (PARTITION BY dkey ORDER
    * BY cs)` exactly. Input is a canvas-bounded day raster
    * (dkey, px, py, cnt); every relation here is canvas-bounded.
    */
  private[operators] def frameRender(raster: DataFrame): DataFrame = {
    val offs = (for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))).toSeq
    // sp feeds the histogram chain AND the final shade join; hist
    // feeds three aggregates (histO/below/tot). DELIBERATELY NOT
    // cached: a .cache() here is a pushdown barrier — incremental
    // consumers filter frameRender's output to the churned-day slice,
    // and with the cache in place the InMemoryRelation materializes
    // EVERY day's spread fold before the dkey predicate applies
    // (measured: pipeline_job_incremental 3.6→4.7 s warm, nosort leg
    // 3.1→4.8 s with the caches in). Re-running the canvas-bounded
    // fold per consumer subtree is cheaper than losing the pushdown.
    val sp = raster.select(col("dkey"), col("px"), col("py"), col("cnt"),
        explode(array(offs: _*)).as("o"))
      .select(col("dkey"), (col("px") + col("o.dx")).as("qx"),
        (col("py") + col("o.dy")).as("qy"), col("cnt"))
      .filter(col("qx") >= 0 && col("qx") <= (W - 1) &&
        col("qy") >= 0 && col("qy") <= (H - 1))
      .groupBy(col("dkey"), col("qx"), col("qy"))
      .agg(sum(col("cnt")).as("cs"))
    val hist = sp.groupBy(col("dkey"), col("cs")).agg(count(lit(1)).as("m"))
    // below / n_cells as WINDOWS over the one hist relation (r22):
    // the previous shape computed below via an inequality broadcast
    // self-join (O(k²) probe per frame, k = distinct counts) and
    // n_cells via a third aggregate — with sp deliberately uncached
    // (pushdown, above), each consumer subtree re-ran the spread fold,
    // so one frameRender paid it ~4×. hist rows are UNIQUE per
    // (dkey, cs), so a ROWS-framed cumulative sum ordered by cs is
    // exactly "Σ m over cs' < cs", and both windows share one
    // dkey-partitioned sort. Same integer sums, same doubles —
    // bit-identical shades (oracle-pinned).
    val wBelow = Window.partitionBy(col("dkey")).orderBy(col("cs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prk = when(col("n_cells") === 1, lit(0.0))
      .otherwise(col("below").cast("double") / (col("n_cells") - 1).cast("double"))
    val lookup = hist
      .withColumn("below", coalesce(sum(col("m")).over(wBelow), lit(0L)))
      .withColumn("n_cells", sum(col("m")).over(Window.partitionBy(col("dkey"))))
      .select(col("dkey").as("dk_l"), col("cs").as("cs_l"),
        floor(prk * 255).as("shade"))
    val shaded = sp.join(broadcast(lookup),
        col("dk_l") === col("dkey") && col("cs_l") === col("cs"))
      .select(col("dkey"), col("qx"), col("qy"), col("cs"), col("shade"))
    val red = least(lit(255L), col("shade") * 3L)
    val green = greatest(lit(0L), least(lit(255L), (col("shade") - 85L) * 3L))
    val blue = greatest(lit(0L), least(lit(255L), (col("shade") - 170L) * 3L))
    shaded
      .select(col("dkey"), col("cs"), col("shade"),
        (((col("qx") * 1009L + col("qy")) *
          (red * 65536L + green * 256L + blue + 1L)) % 1000000007L).as("mix"))
      .groupBy(col("dkey"))
      .agg(count(lit(1)).as("n_spread"), sum(col("cs")).as("spread_mass"),
        sum(col("shade")).as("shade_mass"), sum(col("mix")).as("rgb_digest"))
  }

  def pipelineFrameBuild(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val inb = col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1
    // [1-3] one scan: project, bin (overflow cell for out-of-bbox)
    val r = points(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("dkey"), mercX, mercY)
      .select(col("dkey"),
        when(inb, least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1)))
          .otherwise(lit(-1L)).cast("long").as("px"),
        when(inb, least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1)))
          .otherwise(lit(-1L)).cast("long").as("py"))
      .groupBy(col("dkey"), col("px"), col("py")).agg(count(lit(1)).as("cnt"))
      .stableCheckpoint()
    val raster = r.filter(col("px") >= 0)
    val stages = r.groupBy(col("dkey")).agg(
      sum(col("cnt")).as("n_points"),
      sum(when(col("px") >= 0, col("cnt")).otherwise(0L)).as("n_bbox"),
      sum(when(col("px") >= 0, 1L).otherwise(0L)).as("n_lit"))
    val frame = frameRender(raster)
    stages.join(frame, Seq("dkey"), "left_outer")
      .select(col("dkey").as("day"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(dkey AS INT)), 'yyyy-MM-dd')")
          .as("frame_day"),
        col("n_points"), col("n_bbox"), col("n_lit"),
        coalesce(col("n_spread"), lit(0L)).as("n_spread"),
        coalesce(col("spread_mass"), lit(0L)).as("spread_mass"),
        coalesce(col("shade_mass"), lit(0L)).as("shade_mass"),
        coalesce(col("rgb_digest"), lit(0L)).as("rgb_digest"))
      .orderBy(col("day"))
  }

  /** DuckDB twin: the shared point/merc CTEs, the overflow-cell day
    * binning, the 3×3 spread, per-frame percent_rank eq-hist (the
    * two-pass histogram's closed form), fire ramp, same digest. */
  val pipelineFrameBuildSql: String =
    s"""WITH $pointsCte, $mercCte,
       |pr AS (
       |  SELECT epoch_us(ts) // 86400000000 AS dkey,
       |    CASE WHEN x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |      THEN CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT)
       |      ELSE -1 END AS px,
       |    CASE WHEN x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |      THEN CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT)
       |      ELSE -1 END AS py,
       |    count(*) AS cnt
       |  FROM merc GROUP BY 1, 2, 3),
       |stg AS (SELECT dkey, CAST(sum(cnt) AS BIGINT) AS n_points,
       |    CAST(sum(CASE WHEN px >= 0 THEN cnt ELSE 0 END) AS BIGINT) AS n_bbox,
       |    CAST(sum(CASE WHEN px >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lit
       |  FROM pr GROUP BY 1),
       |off AS (SELECT o1.d AS dx, o2.d AS dy
       |  FROM (SELECT unnest(range(-1, 2)) AS d) o1
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) o2),
       |sp AS (SELECT dkey, px + dx AS qx, py + dy AS qy,
       |    CAST(sum(cnt) AS BIGINT) AS cs
       |  FROM pr CROSS JOIN off
       |  WHERE px >= 0 AND px + dx BETWEEN 0 AND ${W - 1}
       |    AND py + dy BETWEEN 0 AND ${H - 1}
       |  GROUP BY 1, 2, 3),
       |sh AS (SELECT dkey, qx, qy, cs,
       |    CAST(floor(percent_rank() OVER (PARTITION BY dkey ORDER BY cs) * 255)
       |      AS BIGINT) AS shade
       |  FROM sp),
       |rgb AS (SELECT dkey, cs, shade,
       |    ((qx * 1009 + qy) *
       |     (least(255, shade * 3) * 65536 +
       |      greatest(0, least(255, (shade - 85) * 3)) * 256 +
       |      greatest(0, least(255, (shade - 170) * 3)) + 1)) % 1000000007 AS mix
       |  FROM sh),
       |fr AS (SELECT dkey, count(*) AS n_spread,
       |    CAST(sum(cs) AS BIGINT) AS spread_mass,
       |    CAST(sum(shade) AS BIGINT) AS shade_mass,
       |    CAST(sum(mix) AS BIGINT) AS rgb_digest
       |  FROM rgb GROUP BY 1)
       |SELECT CAST(stg.dkey AS BIGINT) AS day,
       |  strftime(DATE '1970-01-01' + CAST(stg.dkey AS INT), '%Y-%m-%d') AS frame_day,
       |  n_points, n_bbox, n_lit,
       |  COALESCE(n_spread, 0) AS n_spread,
       |  COALESCE(spread_mass, 0) AS spread_mass,
       |  COALESCE(shade_mass, 0) AS shade_mass,
       |  COALESCE(rgb_digest, 0) AS rgb_digest
       |FROM stg LEFT JOIN fr ON fr.dkey = stg.dkey
       |ORDER BY day""".stripMargin

  // ------------------------------------------ incremental frame build
  /** SQL twin of [[frameRender]]: spread → per-frame percent_rank
    * eq-hist → fire-ramp digest over a raster CTE `src`(dkey,px,py,cnt),
    * CTE names suffixed so the incremental face can render two legs in
    * one statement. Requires the shared `off` offsets CTE in scope. */
  private def renderSql(src: String, sfx: String): String =
    s"""sp$sfx AS (SELECT dkey, px + dx AS qx, py + dy AS qy,
       |    CAST(sum(cnt) AS BIGINT) AS cs
       |  FROM $src CROSS JOIN off
       |  WHERE px + dx BETWEEN 0 AND ${W - 1}
       |    AND py + dy BETWEEN 0 AND ${H - 1}
       |  GROUP BY 1, 2, 3),
       |sh$sfx AS (SELECT dkey, qx, qy, cs,
       |    CAST(floor(percent_rank() OVER (PARTITION BY dkey ORDER BY cs) * 255)
       |      AS BIGINT) AS shade
       |  FROM sp$sfx),
       |dig$sfx AS (SELECT dkey,
       |    CAST(sum(((qx * 1009 + qy) *
       |      (least(255, shade * 3) * 65536 +
       |       greatest(0, least(255, (shade - 85) * 3)) * 256 +
       |       greatest(0, least(255, (shade - 170) * 3)) + 1)) % 1000000007)
       |      AS BIGINT) AS rgb_digest
       |  FROM sh$sfx GROUP BY 1)""".stripMargin

  /** Incremental frame rebuild (r17) — [[pipelineFrameBuild]]'s
    * delta-ingest twin, completing the Geo family's build symmetry the
    * way [[graft.operators.Multimodal.pipelineMediaIncremental]]
    * completes the media side's: a late-arriving point batch (event_id
    * ≡ 0 mod 10, [[graft.operators.Maintain.aggIncremental]]'s delta
    * convention) lands on a standing frame set, and ONLY the frames the
    * delta actually touches are re-rendered — per affected frame day,
    * the ledger row carries the arriving in-bbox point count, the
    * before/after bbox-survivor and lit-cell counts, the before/after
    * [[frameRender]] RGB digests, a `render_changed` flag (a delta CAN
    * leave the digest intact when eq-hist re-ranks to the same shades),
    * and the constant frames_total / frames_touched pair — the
    * skip-work accounting that justifies the incremental path.
    *
    * == Scale design ==
    * One corpus scan folds map-side onto the bounded (day, px, py)
    * relation carrying BOTH leg counts (standing `cb`, total `ca`,
    * delta `cd`) — on the test corpus this scan plays the role of the
    * persisted base raster + the arriving batch; a deployment keeps
    * the (day, px, py, cnt) relation as a table (it is exactly what
    * [[layoutHilbertWrite]] persists) and scans only the delta, so the
    * nightly cost is O(delta) + O(affected-day rasters), never the
    * corpus. Affected days collapse to a broadcast set; both render
    * legs and the ledger are canvas-bounded × affected-days; untouched
    * frames are never re-shaded (the frames_touched / frames_total
    * margin). Out-of-bbox delta points are dropped at the fold — they
    * cannot change a frame.
    */
  def pipelineFrameIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val inb = col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1
    val r = points(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("dkey"),
        (pmod(col("event_id"), lit(10)) === 0).cast("long").as("d"), mercX, mercY)
      .filter(inb)
      .select(col("dkey"), col("d"),
        least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1))
          .cast("long").as("px"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1))
          .cast("long").as("py"))
      .groupBy(col("dkey"), col("px"), col("py"))
      .agg(sum(lit(1L) - col("d")).as("cb"), count(lit(1)).as("ca"),
        sum(col("d")).as("cd"))
      .stableCheckpoint()
    val aff = r.filter(col("cd") > 0).select(col("dkey")).distinct()
    val rAff = r.join(broadcast(aff), Seq("dkey"))
    val stats = rAff.groupBy(col("dkey")).agg(
      sum(col("cd")).as("n_delta"),
      sum(col("cb")).as("n_points_before"),
      sum(col("ca")).as("n_points_after"),
      sum(when(col("cb") > 0, 1L).otherwise(0L)).as("n_lit_before"),
      count(lit(1)).as("n_lit_after"))
    val digB = frameRender(rAff.filter(col("cb") > 0)
        .select(col("dkey"), col("px"), col("py"), col("cb").as("cnt")))
      .select(col("dkey"), col("rgb_digest").as("rgb_digest_before"))
    val digA = frameRender(rAff
        .select(col("dkey"), col("px"), col("py"), col("ca").as("cnt")))
      .select(col("dkey"), col("rgb_digest").as("rgb_digest_after"))
    val totals = r.agg(countDistinct(col("dkey")).as("frames_total"))
    val touched = aff.agg(count(lit(1)).as("frames_touched"))
    stats
      .join(digB, Seq("dkey"), "left_outer")
      .join(digA, Seq("dkey"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(touched))
      .select(col("dkey").as("day"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(dkey AS INT)), 'yyyy-MM-dd')")
          .as("frame_day"),
        col("n_delta"), col("n_points_before"), col("n_points_after"),
        col("n_lit_before"), col("n_lit_after"),
        coalesce(col("rgb_digest_before"), lit(0L)).as("rgb_digest_before"),
        col("rgb_digest_after"),
        (coalesce(col("rgb_digest_before"), lit(-1L)) =!= col("rgb_digest_after"))
          .cast("long").as("render_changed"),
        col("frames_total"), col("frames_touched"))
      .orderBy(col("day"))
  }

  /** DuckDB twin: one in-bbox fold carrying both leg counts, affected
    * days, [[renderSql]] twice (before/after), the same ledger. */
  val pipelineFrameIncrementalSql: String =
    s"""WITH $pointsCte, $mercCte,
       |pr AS (
       |  SELECT epoch_us(ts) // 86400000000 AS dkey,
       |    CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT) AS px,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT) AS py,
       |    CAST(sum(CASE WHEN event_id % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb,
       |    count(*) AS ca,
       |    CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cd
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2, 3),
       |aff AS (SELECT DISTINCT dkey FROM pr WHERE cd > 0),
       |rb AS (SELECT dkey, px, py, cb AS cnt FROM pr JOIN aff USING (dkey)
       |  WHERE cb > 0),
       |ra AS (SELECT dkey, px, py, ca AS cnt FROM pr JOIN aff USING (dkey)),
       |off AS (SELECT o1.d AS dx, o2.d AS dy
       |  FROM (SELECT unnest(range(-1, 2)) AS d) o1
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) o2),
       |${renderSql("rb", "b")},
       |${renderSql("ra", "a")},
       |stats AS (SELECT dkey,
       |    CAST(sum(cd) AS BIGINT) AS n_delta,
       |    CAST(sum(cb) AS BIGINT) AS n_points_before,
       |    CAST(sum(ca) AS BIGINT) AS n_points_after,
       |    CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lit_before,
       |    count(*) AS n_lit_after
       |  FROM pr JOIN aff USING (dkey) GROUP BY 1),
       |tot AS (SELECT count(DISTINCT dkey) AS frames_total FROM pr),
       |tch AS (SELECT count(*) AS frames_touched FROM aff)
       |SELECT CAST(stats.dkey AS BIGINT) AS day,
       |  strftime(DATE '1970-01-01' + CAST(stats.dkey AS INT), '%Y-%m-%d') AS frame_day,
       |  n_delta, n_points_before, n_points_after, n_lit_before, n_lit_after,
       |  COALESCE(db.rgb_digest, 0) AS rgb_digest_before,
       |  da.rgb_digest AS rgb_digest_after,
       |  CAST(CASE WHEN COALESCE(db.rgb_digest, -1) <> da.rgb_digest
       |    THEN 1 ELSE 0 END AS BIGINT) AS render_changed,
       |  frames_total, frames_touched
       |FROM stats
       |LEFT JOIN digb db ON db.dkey = stats.dkey
       |JOIN diga da ON da.dkey = stats.dkey
       |CROSS JOIN tot CROSS JOIN tch
       |ORDER BY day""".stripMargin

  // ------------------------------------------------ whole-job manifest
  /** The reference's WHOLE job as one key (r18 — the last structural
    * seam closed): the reference runs fan-out (Implementation.cs:47-58,
    * one array task per month) → per-frame render (main.py:21-96) →
    * ordered assembly (Reduce.ps1:8, ffmpeg consuming the ordered frame
    * list). The registered faces cover each stage — [[mapFanout]] plans
    * the frames, [[pipelineFrameBuild]] renders one, [[reduceAssemble]]
    * sequences them — but reduceAssemble's manifest carries only the
    * fan-out's event_id checksum, while the encoder manifest the real
    * reduce step consumes carries the per-frame RENDER digest. This key
    * chains all three: per frame (in-bbox day, the fan-out contract),
    * the manifest row holds the frame sequence, in-bbox point count and
    * fan-out checksum, cumulative point offsets, total frame count, the
    * 2-fps presentation timestamp, and [[frameRender]]'s exact
    * `rgb_digest` — byte-for-byte the columns [[reduceAssemble]] emits
    * on seq/offsets and [[pipelineFrameBuild]] emits on digests (the
    * spec pins both equivalences).
    *
    * == Scale design ==
    * ONE corpus scan folds map-side onto the bounded (day, px, py)
    * relation with the fan-out checksum folded per cell (sum of
    * event_id mod 997 rides the same combine as the count), then
    * checkpointed — the render legs and the day ledger both read the
    * materialized relation, never the points. The manifest windows
    * (row_number / running sum / count) sort the O(days) ledger — the
    * documented bounded-relation single-partition window — and the
    * per-day render is embarrassingly parallel across frames, exactly
    * the reference's array job re-expressed as group keys.
    */
  def pipelineJobBuild(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    // [fan-out] one scan: in-bbox day binning, checksum folded per cell
    val r = points(s, dir)
      .select(col("event_id"), expr("unix_micros(ts) div 86400000000").as("dkey"),
        mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .select(col("dkey"),
        least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1)).cast("long").as("px"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1)).cast("long").as("py"),
        (col("event_id") % 997L).as("ck"))
      .groupBy(col("dkey"), col("px"), col("py"))
      .agg(count(lit(1)).as("cnt"), sum(col("ck")).as("chk"))
      .stableCheckpoint()
    // [render] per-frame digest over the same bounded relation
    val frame = frameRender(r.select(col("dkey"), col("px"), col("py"), col("cnt")))
      .select(col("dkey"), col("rgb_digest"))
    // [assemble] ordered manifest over the O(days) ledger
    val days = r.groupBy(col("dkey"))
      .agg(sum(col("cnt")).as("n_points"), sum(col("chk")).as("checksum"))
    val wRun = Window.orderBy(col("frame_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(frame, Seq("dkey"))
      .withColumn("frame_seq", row_number().over(Window.orderBy(col("dkey"))).cast("long"))
      .select(col("frame_seq"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(dkey AS INT)), 'yyyy-MM-dd')")
          .as("frame_day"),
        col("n_points"), col("checksum"),
        sum(col("n_points")).over(wRun).as("cum_points"),
        count(lit(1)).over(Window.partitionBy()).as("total_frames"),
        ((col("frame_seq") - 1) / 2.0).as("pts_sec"),
        col("rgb_digest"))
      .orderBy(col("frame_seq"))
  }

  /** DuckDB twin: the shared point/merc CTEs, the in-bbox cell fold
    * with the checksum riding the combine, [[renderSql]] for the digest
    * leg, the same ordered-manifest windows. */
  val pipelineJobBuildSql: String =
    s"""WITH $pointsCte, $mercCte,
       |pr AS (
       |  SELECT epoch_us(ts) // 86400000000 AS dkey,
       |    CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT) AS px,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT) AS py,
       |    count(*) AS cnt, CAST(sum(event_id % 997) AS BIGINT) AS chk
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2, 3),
       |off AS (SELECT o1.d AS dx, o2.d AS dy
       |  FROM (SELECT unnest(range(-1, 2)) AS d) o1
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) o2),
       |${renderSql("pr", "j")},
       |d AS (SELECT dkey, CAST(sum(cnt) AS BIGINT) AS n_points,
       |    CAST(sum(chk) AS BIGINT) AS checksum
       |  FROM pr GROUP BY 1),
       |seq AS (SELECT CAST(row_number() OVER (ORDER BY dkey) AS BIGINT) AS frame_seq,
       |    dkey, n_points, checksum FROM d)
       |SELECT frame_seq,
       |  strftime(DATE '1970-01-01' + CAST(seq.dkey AS INT), '%Y-%m-%d') AS frame_day,
       |  n_points, checksum,
       |  CAST(sum(n_points) OVER (ORDER BY frame_seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_points,
       |  count(*) OVER () AS total_frames,
       |  (frame_seq - 1) / 2.0 AS pts_sec,
       |  dig.rgb_digest
       |FROM seq JOIN digj dig ON dig.dkey = seq.dkey
       |ORDER BY frame_seq""".stripMargin

  // -------------------------------------------- incremental job manifest
  /** Incremental MANIFEST maintenance (r18 — [[pipelineJobBuild]]'s
    * delta twin, and the accounting [[pipelineFrameIncremental]] cannot
    * see: that face proves only TOUCHED frames re-render, but the job's
    * final artifact is the ordered manifest, and its cumulative offsets
    * make incremental assembly structurally worse than incremental
    * rendering — one touched frame shifts `cum_points` for EVERY later
    * frame, so the encoder must re-emit the whole suffix. This ledger
    * quantifies that amplification: the late batch (event_id ≡ 0 mod
    * 10, the family's delta convention) lands on the standing manifest,
    * and per after-frame the row carries both legs' point counts, the
    * delta, `touched` (delta landed on the frame), `digest_changed`
    * (the re-render actually changed the RGB digest — a delta CAN
    * re-rank eq-hist to the same shades), `offsets_shifted` (the
    * frame's sequence number or cumulative offset moved), `rewrite`
    * (any of the three — the rows the encoder re-emits), and the
    * constant totals. `frames_rewritten` ≥ `frames_touched` is the
    * structural lesson: rewrite is a SUFFIX from the first touched
    * frame (spec-pinned), which is why real encoder manifests version
    * offsets per chunk instead of globally.
    *
    * == Scale design ==
    * ONE corpus scan folds map-side onto the bounded (day, px, py)
    * relation carrying both leg counts (at 100 TB the standing leg is
    * the persisted raster table and only the delta is scanned);
    * affected days broadcast, ONLY touched frames render (both legs,
    * canvas-bounded × affected days — untouched frames keep their
    * digest by construction and are never re-shaded); the two manifest
    * legs are O(days) windows on the day ledger.
    */
  def pipelineJobIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val inb = col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1
    val r = points(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("dkey"),
        (pmod(col("event_id"), lit(10)) === 0).cast("long").as("d"), mercX, mercY)
      .filter(inb)
      .select(col("dkey"), col("d"),
        least(floor((col("x") - X0) / (X1 - X0) * W), lit(W - 1))
          .cast("long").as("px"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * H), lit(H - 1))
          .cast("long").as("py"))
      .groupBy(col("dkey"), col("px"), col("py"))
      .agg(sum(lit(1L) - col("d")).as("cb"), count(lit(1)).as("ca"),
        sum(col("d")).as("cd"))
      .stableCheckpoint()
    val aff = r.filter(col("cd") > 0).select(col("dkey")).distinct()
    val rAff = r.join(broadcast(aff), Seq("dkey"))
    val digB = frameRender(rAff.filter(col("cb") > 0)
        .select(col("dkey"), col("px"), col("py"), col("cb").as("cnt")))
      .select(col("dkey"), col("rgb_digest").as("dig_b"))
    val digA = frameRender(rAff
        .select(col("dkey"), col("px"), col("py"), col("ca").as("cnt")))
      .select(col("dkey"), col("rgb_digest").as("dig_a"))
    val days = r.groupBy(col("dkey")).agg(
      sum(col("cb")).as("nb"), sum(col("ca")).as("na"), sum(col("cd")).as("nd"))
    val wRun = Window.orderBy(col("dkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = days.filter(col("nb") > 0)
      .select(col("dkey"),
        row_number().over(Window.orderBy(col("dkey"))).cast("long").as("seq_b"),
        sum(col("nb")).over(wRun).as("cum_b"))
    val after = days
      .select(col("dkey"), col("nb"), col("na"), col("nd"),
        row_number().over(Window.orderBy(col("dkey"))).cast("long").as("seq_a"),
        sum(col("na")).over(wRun).as("cum_a"))
    val led = after
      .join(before, Seq("dkey"), "left_outer")
      .join(digB, Seq("dkey"), "left_outer")
      .join(digA, Seq("dkey"), "left_outer")
      .withColumn("touched", (col("nd") > 0).cast("long"))
      .withColumn("digest_changed",
        when(col("nd") > 0, coalesce(col("dig_b"), lit(-1L)) =!= col("dig_a"))
          .otherwise(lit(false)).cast("long"))
      .withColumn("offsets_shifted",
        (col("seq_b").isNull || col("seq_b") =!= col("seq_a") ||
          col("cum_b") =!= col("cum_a")).cast("long"))
      .withColumn("rewrite",
        greatest(col("touched"), col("digest_changed"), col("offsets_shifted")))
    val tot = led.agg(count(lit(1)).as("frames_total"),
      sum(col("touched")).as("frames_touched"),
      sum(col("rewrite")).as("frames_rewritten"))
    led.crossJoin(broadcast(tot))
      .select(col("seq_a").as("frame_seq"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(dkey AS INT)), 'yyyy-MM-dd')")
          .as("frame_day"),
        col("nb").as("n_points_before"), col("na").as("n_points_after"),
        col("nd").as("delta_points"), col("touched"), col("digest_changed"),
        col("offsets_shifted"), col("rewrite"),
        col("frames_total"), col("frames_touched"), col("frames_rewritten"))
      .orderBy(col("frame_seq"))
  }

  /** DuckDB twin: the two-leg cell fold, affected days, [[renderSql]]
    * per leg on touched frames only, both manifest windows, the same
    * rewrite ledger. */
  val pipelineJobIncrementalSql: String =
    s"""WITH $pointsCte, $mercCte,
       |pr AS (
       |  SELECT epoch_us(ts) // 86400000000 AS dkey,
       |    CAST(least(floor((x - ($X0)) / (${X1 - X0}) * $W), ${W - 1}) AS BIGINT) AS px,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * $H), ${H - 1}) AS BIGINT) AS py,
       |    CAST(sum(CASE WHEN event_id % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb,
       |    count(*) AS ca,
       |    CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cd
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2, 3),
       |aff AS (SELECT DISTINCT dkey FROM pr WHERE cd > 0),
       |rb AS (SELECT dkey, px, py, cb AS cnt FROM pr JOIN aff USING (dkey)
       |  WHERE cb > 0),
       |ra AS (SELECT dkey, px, py, ca AS cnt FROM pr JOIN aff USING (dkey)),
       |off AS (SELECT o1.d AS dx, o2.d AS dy
       |  FROM (SELECT unnest(range(-1, 2)) AS d) o1
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) o2),
       |${renderSql("rb", "b")},
       |${renderSql("ra", "a")},
       |d AS (SELECT dkey, CAST(sum(cb) AS BIGINT) AS nb,
       |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cd) AS BIGINT) AS nd
       |  FROM pr GROUP BY 1),
       |bm AS (SELECT dkey,
       |    CAST(row_number() OVER (ORDER BY dkey) AS BIGINT) AS seq_b,
       |    CAST(sum(nb) OVER (ORDER BY dkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
       |  FROM d WHERE nb > 0),
       |am AS (SELECT dkey, nb, na, nd,
       |    CAST(row_number() OVER (ORDER BY dkey) AS BIGINT) AS seq_a,
       |    CAST(sum(na) OVER (ORDER BY dkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a
       |  FROM d),
       |led AS (SELECT am.*, bm.seq_b, bm.cum_b, db.rgb_digest AS dig_b,
       |    da.rgb_digest AS dig_a
       |  FROM am LEFT JOIN bm USING (dkey)
       |  LEFT JOIN digb db ON db.dkey = am.dkey
       |  LEFT JOIN diga da ON da.dkey = am.dkey),
       |l2 AS (SELECT *,
       |    CASE WHEN nd > 0 THEN 1 ELSE 0 END AS touched,
       |    CASE WHEN nd > 0 AND COALESCE(dig_b, -1) <> dig_a
       |      THEN 1 ELSE 0 END AS digest_changed,
       |    CASE WHEN seq_b IS NULL OR seq_b <> seq_a OR cum_b <> cum_a
       |      THEN 1 ELSE 0 END AS offsets_shifted
       |  FROM led),
       |l3 AS (SELECT *,
       |    greatest(touched, digest_changed, offsets_shifted) AS rewrite
       |  FROM l2),
       |tot AS (SELECT count(*) AS frames_total,
       |    CAST(sum(touched) AS BIGINT) AS frames_touched,
       |    CAST(sum(rewrite) AS BIGINT) AS frames_rewritten
       |  FROM l3)
       |SELECT seq_a AS frame_seq,
       |  strftime(DATE '1970-01-01' + CAST(dkey AS INT), '%Y-%m-%d') AS frame_day,
       |  nb AS n_points_before, na AS n_points_after, nd AS delta_points,
       |  CAST(touched AS BIGINT) AS touched,
       |  CAST(digest_changed AS BIGINT) AS digest_changed,
       |  CAST(offsets_shifted AS BIGINT) AS offsets_shifted,
       |  CAST(rewrite AS BIGINT) AS rewrite,
       |  frames_total, frames_touched, frames_rewritten
       |FROM l3 CROSS JOIN tot
       |ORDER BY frame_seq""".stripMargin

  // --------------------------------------------------------- Z-order
  /** 16-bit Morton spread: interleave-ready bit expansion via the
    * classic shift-or-mask ladder — pure codegen'd integer ops, and the
    * identical `<< | &` arithmetic replays in DuckDB.
    */
  private[graft] def spread16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (e, (sh, m)) =>
        e.bitwiseOR(shiftleft(e, sh)).bitwiseAND(lit(m))
      }

  private def spreadSql(e: String): String =
    Seq((8, "16711935"), (4, "252645135"), (2, "858993459"), (1, "1431655765"))
      .foldLeft(s"(($e) & 65535)") { case (x, (sh, m)) =>
        s"((($x) | (($x) << $sh)) & $m)"
      }

  /** Z-order (Morton) data-layout key over the raster grid: interleave
    * the bits of (px, py) and roll the raster up by 256×256-cell
    * Z-tiles (zkey >> 16). The per-tile px/py extents in the output ARE
    * the point of Z-ordering: every tile is a compact ≤256-wide
    * rectangle (spec-asserted), so files written in zkey ranges carry
    * tight min/max column stats for BOTH dimensions and a 2-D bbox
    * predicate prunes files/row-groups on either axis.
    *
    * == Scale design ==
    * This is the clustering key for the writer:
    * `repartitionByRange(col("zkey")).sortWithinPartitions("zkey")`
    * before a parquet write yields the multi-dimensional data-skipping
    * layout (the Delta OPTIMIZE ZORDER BY equivalent) with one range
    * shuffle. The key itself is a handful of codegen'd shift/mask ops —
    * no UDF, no precision loss, monotone in interleaved bit order.
    */
  def layoutZorder(s: SparkSession, dir: String): DataFrame =
    rasterDf(s, dir)
      .withColumn("zkey", spread16(col("px"))
        .bitwiseOR(shiftleft(spread16(col("py")), 1)))
      .withColumn("tile", expr("zkey div 65536"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_points"),
        min(col("px")).as("px_min"), max(col("px")).as("px_max"),
        min(col("py")).as("py_min"), max(col("py")).as("py_max"))
      .orderBy(col("tile"))

  val layoutZorderSql: String = {
    val z = s"(${spreadSql("px")} | (${spreadSql("py")} << 1))"
    s"""WITH $pointsCte, $mercCte, $rasterCte,
       |z AS (SELECT px, py, cnt, $z // 65536 AS tile FROM raster)
       |SELECT tile, count(*) AS n_cells, CAST(sum(cnt) AS BIGINT) AS n_points,
       |  min(px) AS px_min, max(px) AS px_max,
       |  min(py) AS py_min, max(py) AS py_max
       |FROM z GROUP BY tile ORDER BY tile""".stripMargin
  }

  /** The four fixed pixel-space query boxes the skipping audit probes
    * (box_id, x0, y0, x1, y1) — a quarter, a wide band, the center,
    * and a small corner. */
  private val skipBoxes =
    "stack(4, 0L,0L,0L,349L,249L, 1L,700L,0L,1399L,499L, " +
      "2L,350L,250L,1049L,749L, 3L,1200L,800L,1399L,999L) " +
      "AS (box_id, bx0, by0, bx1, by1)"

  /** Data-skipping effectiveness audit — the measurement that justifies
    * a layout rewrite before anyone pays for it: the raster cells are
    * laid out into 256-cell files two ways (row-major `linear` vs
    * Morton `zorder`), each file keeps min/max zone-map stats on both
    * axes (exactly what parquet row-group stats give a 2-D predicate),
    * and four fixed query boxes are planned against each layout. Per
    * (layout, box): files touched vs total, cells scanned vs actually
    * matching, and the read amplification in exact ppm. Z-order files
    * are compact rectangles so boxes prune on BOTH axes; linear files
    * span full rows and only prune on y — the ppm gap between the two
    * rows is the business case for [[layoutZorder]].
    *
    * == Scale design ==
    * The ranking relation is the CANVAS-BOUNDED cell grid (≤1.4M
    * cells), not the point corpus — the events scan folds map-side
    * into it once ([[rasterDf]], checkpointed here since two consumers
    * read it). The per-layout row_number is over that bounded
    * relation; file summaries (≤342 files/layout) and the 4-box probe
    * are broadcast-sized. At 100 TB of points this stays grid-sized
    * after the one rasterize pass.
    */
  def layoutSkippingEval(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val F = 256L
    val raster = rasterDf(s, dir).stableCheckpoint()
    val zkey = spread16(col("px")).bitwiseOR(shiftleft(spread16(col("py")), 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("layout")).orderBy(col("okey"))
    val files = raster
      .select(col("px"), col("py"), col("cnt"),
        explode(array(lit("linear"), lit("zorder"))).as("layout"))
      .withColumn("okey", when(col("layout") === "linear",
        col("py") * 2048L + col("px")).otherwise(zkey))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1) div $F"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_points"),
        min(col("px")).as("fx0"), max(col("px")).as("fx1"),
        min(col("py")).as("fy0"), max(col("py")).as("fy1"))
    val boxes = s.range(1).select(expr(skipBoxes))
    val matching = raster.crossJoin(broadcast(boxes))
      .filter(col("px") >= col("bx0") && col("px") <= col("bx1") &&
        col("py") >= col("by0") && col("py") <= col("by1"))
      .groupBy(col("box_id"))
      .agg(count(lit(1)).as("cells_matching"), sum(col("cnt")).as("points_matching"))
    files.crossJoin(broadcast(boxes))
      .withColumn("files_total", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("layout"), col("box_id"))))
      .filter(col("fx1") >= col("bx0") && col("fx0") <= col("bx1") &&
        col("fy1") >= col("by0") && col("fy0") <= col("by1"))
      .groupBy(col("layout"), col("box_id"), col("files_total"))
      .agg(count(lit(1)).as("files_touched"),
        sum(col("n_cells")).as("cells_scanned"))
      .join(broadcast(matching), Seq("box_id"))
      .select(col("layout"), col("box_id"), col("files_total"),
        col("files_touched"), col("cells_scanned"), col("cells_matching"),
        expr("(1000000 * cells_scanned) div greatest(cells_matching, 1)")
          .as("read_amp_ppm"))
      .orderBy(col("layout"), col("box_id"))
  }

  /** DuckDB twin: same bounded ranking, same zone-map intersection. */
  val layoutSkippingEvalSql: String = {
    val z = s"(${spreadSql("px")} | (${spreadSql("py")} << 1))"
    s"""WITH $pointsCte, $mercCte, $rasterCte,
       |l AS (
       |  SELECT px, py, cnt, 'linear' AS layout, py * 2048 + px AS okey FROM raster
       |  UNION ALL
       |  SELECT px, py, cnt, 'zorder', $z FROM raster),
       |r AS (SELECT layout, cnt, px, py,
       |    (row_number() OVER (PARTITION BY layout ORDER BY okey) - 1) // 256 AS file_id
       |  FROM l),
       |files AS (SELECT layout, file_id, count(*) AS n_cells,
       |    min(px) AS fx0, max(px) AS fx1, min(py) AS fy0, max(py) AS fy1
       |  FROM r GROUP BY 1, 2),
       |boxes AS (SELECT * FROM (VALUES (0, 0, 0, 349, 249), (1, 700, 0, 1399, 499),
       |    (2, 350, 250, 1049, 749), (3, 1200, 800, 1399, 999))
       |  AS t(box_id, bx0, by0, bx1, by1)),
       |m AS (SELECT box_id, count(*) AS cells_matching
       |  FROM raster CROSS JOIN boxes
       |  WHERE px >= bx0 AND px <= bx1 AND py >= by0 AND py <= by1
       |  GROUP BY box_id),
       |ft AS (SELECT layout, count(*) AS files_total FROM files GROUP BY layout),
       |hit AS (SELECT layout, box_id, count(*) AS files_touched,
       |    CAST(sum(n_cells) AS BIGINT) AS cells_scanned
       |  FROM files CROSS JOIN boxes
       |  WHERE fx1 >= bx0 AND fx0 <= bx1 AND fy1 >= by0 AND fy0 <= by1
       |  GROUP BY 1, 2)
       |SELECT hit.layout, CAST(hit.box_id AS BIGINT) AS box_id,
       |  CAST(ft.files_total AS BIGINT) AS files_total,
       |  CAST(files_touched AS BIGINT) AS files_touched, cells_scanned,
       |  CAST(cells_matching AS BIGINT) AS cells_matching,
       |  (1000000 * cells_scanned) // greatest(cells_matching, 1) AS read_amp_ppm
       |FROM hit JOIN ft USING (layout) JOIN m USING (box_id)
       |ORDER BY layout, box_id""".stripMargin
  }

  // --------------------------------------------------- Hilbert layout
  /** Hilbert xy→d index over the 2048-square (the canvas's covering
    * power of two), appended as column `out` — the classic 11-round
    * bit transform (top-down quadrant descent with the rotate/reflect
    * state carried in (x, y); each round contributes s²·((3·rx)⊕ry)).
    * Materialized ROUND BY ROUND as withColumn stages: a single nested
    * expression would re-reference each round's (x, y) three times and
    * the tree would grow 3¹¹-fold; per-round projections keep it
    * linear and Catalyst's CollapseProject guard (non-cheap exprs
    * referenced more than once are not inlined) preserves that.
    */
  private[graft] def withHilbert(df: DataFrame, xCol: String, yCol: String,
                                 out: String): DataFrame = {
    var d = df.withColumn("hx", col(xCol).cast("long"))
      .withColumn("hy", col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    var s = 1024L
    while (s >= 1L) {
      d = d
        .withColumn("hrx",
          when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("hry",
          when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out,
          col(out) + lit(s * s) * (col("hrx") * 3L).bitwiseXOR(col("hry")))
        .withColumn("hx2", when(col("hry") === 0,
          when(col("hrx") === 1, lit(s - 1) - col("hy")).otherwise(col("hy")))
          .otherwise(col("hx")))
        .withColumn("hy2", when(col("hry") === 0,
          when(col("hrx") === 1, lit(s - 1) - col("hx")).otherwise(col("hx")))
          .otherwise(col("hy")))
        .withColumn("hx", col("hx2")).withColumn("hy", col("hy2"))
      s /= 2L
    }
    d.drop("hx", "hy", "hrx", "hry", "hx2", "hy2")
  }

  /** Hilbert-vs-Morton skipping audit (r14 wave 18) — the
    * better-curve question [[layoutSkippingEval]] leaves open: Morton
    * order has quadrant-boundary JUMPS (the curve teleports across the
    * canvas between quadrants, so a 256-cell file there spans distant
    * regions), the Hilbert curve is fully adjacency-preserving
    * (consecutive indices are always Manhattan neighbors — the spec
    * pins exactly that property), so its files are tighter rectangles
    * and zone-map pruning touches fewer of them. Same harness as the
    * linear-vs-Morton face: 256-cell files per layout, min/max zone
    * maps, the four fixed probe boxes, read amplification in exact
    * ppm. The honest readout stands either way — on axis-aligned
    * probes the two curves are usually close, and the jump cost shows
    * on boxes that straddle a quadrant boundary.
    *
    * == Scale design ==
    * Identical to [[layoutSkippingEval]]: everything after the one
    * rasterize fold runs on the canvas-bounded cell grid; the Hilbert
    * transform is 11 codegen-friendly integer projection stages over
    * that bounded relation, zero extra shuffles.
    */
  def layoutHilbert(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Checkpoints.StableSyntax
    val F = 256L
    val raster = withHilbert(rasterDf(s, dir), "px", "py", "hd")
      .stableCheckpoint()
    val zkey = spread16(col("px")).bitwiseOR(shiftleft(spread16(col("py")), 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("layout")).orderBy(col("okey"))
    val files = raster
      .select(col("px"), col("py"), col("cnt"), col("hd"),
        explode(array(lit("hilbert"), lit("zorder"))).as("layout"))
      .withColumn("okey",
        when(col("layout") === "zorder", zkey).otherwise(col("hd")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("file_id", expr(s"(rn - 1) div $F"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_points"),
        min(col("px")).as("fx0"), max(col("px")).as("fx1"),
        min(col("py")).as("fy0"), max(col("py")).as("fy1"))
    val boxes = s.range(1).select(expr(skipBoxes))
    val matching = raster.crossJoin(broadcast(boxes))
      .filter(col("px") >= col("bx0") && col("px") <= col("bx1") &&
        col("py") >= col("by0") && col("py") <= col("by1"))
      .groupBy(col("box_id"))
      .agg(count(lit(1)).as("cells_matching"))
    files.crossJoin(broadcast(boxes))
      .withColumn("files_total", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("layout"), col("box_id"))))
      .filter(col("fx1") >= col("bx0") && col("fx0") <= col("bx1") &&
        col("fy1") >= col("by0") && col("fy0") <= col("by1"))
      .groupBy(col("layout"), col("box_id"), col("files_total"))
      .agg(count(lit(1)).as("files_touched"),
        sum(col("n_cells")).as("cells_scanned"))
      .join(broadcast(matching), Seq("box_id"))
      .select(col("layout"), col("box_id"), col("files_total"),
        col("files_touched"), col("cells_scanned"), col("cells_matching"),
        expr("(1000000 * cells_scanned) div greatest(cells_matching, 1)")
          .as("read_amp_ppm"))
      .orderBy(col("layout"), col("box_id"))
  }

  /** The Hilbert rounds as chained MATERIALIZED CTEs (same per-round
    * state transform; materialized so DuckDB cannot exponentially
    * inline the thrice-referenced hx/hy). */
  private val hilbertCtes: String = {
    val rounds = Iterator.iterate(1024L)(_ / 2L).takeWhile(_ >= 1L).toSeq
    val chain = rounds.zipWithIndex.map { case (s, i) =>
      val k = i + 1
      s"""hh$k AS MATERIALIZED (SELECT px, py, cnt,
         |  CASE WHEN (hy & $s) = 0 THEN CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0 THEN CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END ELSE hy END AS hy,
         |  hd + ${s * s} * xor(CASE WHEN (hx & $s) > 0 THEN 3 ELSE 0 END,
         |                      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) AS hd
         |FROM hh${i})""".stripMargin
    }.mkString(",\n")
    s"""hh0 AS (SELECT px, py, cnt, CAST(px AS BIGINT) AS hx,
       |  CAST(py AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM raster),
       |$chain""".stripMargin
  }

  /** DuckDB twin: same Hilbert rounds, same file ranking, same
    * zone-map probe. */
  val layoutHilbertSql: String = {
    val z = s"(${spreadSql("px")} | (${spreadSql("py")} << 1))"
    s"""WITH $pointsCte, $mercCte, $rasterCte,
       |$hilbertCtes,
       |l AS (
       |  SELECT px, py, cnt, 'hilbert' AS layout, hd AS okey FROM hh11
       |  UNION ALL
       |  SELECT px, py, cnt, 'zorder', $z FROM raster),
       |r AS (SELECT layout, cnt, px, py,
       |    (row_number() OVER (PARTITION BY layout ORDER BY okey) - 1) // 256 AS file_id
       |  FROM l),
       |files AS (SELECT layout, file_id, count(*) AS n_cells,
       |    min(px) AS fx0, max(px) AS fx1, min(py) AS fy0, max(py) AS fy1
       |  FROM r GROUP BY 1, 2),
       |boxes AS (SELECT * FROM (VALUES (0, 0, 0, 349, 249), (1, 700, 0, 1399, 499),
       |    (2, 350, 250, 1049, 749), (3, 1200, 800, 1399, 999))
       |  AS t(box_id, bx0, by0, bx1, by1)),
       |m AS (SELECT box_id, count(*) AS cells_matching
       |  FROM raster CROSS JOIN boxes
       |  WHERE px >= bx0 AND px <= bx1 AND py >= by0 AND py <= by1
       |  GROUP BY box_id),
       |ft AS (SELECT layout, count(*) AS files_total FROM files GROUP BY layout),
       |hit AS (SELECT layout, box_id, count(*) AS files_touched,
       |    CAST(sum(n_cells) AS BIGINT) AS cells_scanned
       |  FROM files CROSS JOIN boxes
       |  WHERE fx1 >= bx0 AND fx0 <= bx1 AND fy1 >= by0 AND fy0 <= by1
       |  GROUP BY 1, 2)
       |SELECT hit.layout, CAST(hit.box_id AS BIGINT) AS box_id,
       |  CAST(ft.files_total AS BIGINT) AS files_total,
       |  CAST(files_touched AS BIGINT) AS files_touched, cells_scanned,
       |  CAST(cells_matching AS BIGINT) AS cells_matching,
       |  (1000000 * cells_scanned) // greatest(cells_matching, 1) AS read_amp_ppm
       |FROM hit JOIN ft USING (layout) JOIN m USING (box_id)
       |ORDER BY layout, box_id""".stripMargin
  }

  // ------------------------------------------------ hilbert writer
  private val hilbertLayoutReady =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cheap driver-side corpus signature over the events table (the
    * Similarity corpusKey pattern): FS metadata only, no Spark job. */
  private def eventsKey(s: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stats =
      try fs.listStatus(path).map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
      catch { case _: java.io.FileNotFoundException => Array(s"$dir:missing") }
    dir + "|" + stats.sorted.mkString(",")
  }

  /** Materialize the Hilbert-clustered layout as REAL parquet files:
    * the raster cells ranked by their Hilbert index (two-phase
    * range-partitioned rank — no single-task sort), dealt into
    * 256-cell files by the audit's deterministic rule, and WRITTEN
    * partitioned by file id with one physical parquet file per unit
    * (hash repartition on file_id ⇒ each file's rows land in exactly
    * one task). The written files carry genuine row-group zone maps
    * on px/py — what [[layoutHilbert]] models, made disk truth.
    */
  private[graft] def ensureHilbertLayout(s: SparkSession, dir: String): String = {
    val ck = eventsKey(s, dir)
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tag = dirTag +
      "_" + java.lang.Long.toHexString(ck.hashCode.toLong & 0xffffffffL)
    val tbl = s"graft_hilbert_layout_$tag"
    val key = s"${System.identityHashCode(s)}|$ck"
    if (hilbertLayoutReady.containsKey(key) && !s.catalog.tableExists(tbl))
      hilbertLayoutReady.remove(key)
    hilbertLayoutReady.computeIfAbsent(key, _ => {
      val hconf = s.sparkContext.hadoopConfiguration
      val pat = s"graft_hilbert_layout_${dirTag}_"
      s.catalog.listTables().collect().map(_.name)
        .filter(n => n.startsWith(pat) && n != tbl)
        .foreach { n =>
          s.sql(s"DROP TABLE IF EXISTS $n")
          val loc = new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), n)
          loc.getFileSystem(hconf).delete(loc, true)
        }
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
      loc.getFileSystem(hconf).delete(loc, true)
      val ranked = graft.operators.Analytics.globalRowPos(
        withHilbert(rasterDf(s, dir), "px", "py", "hd"),
        Seq.empty, Seq(col("hd")), "rn", "n")
      ranked
        .withColumn("file_id", expr("(rn - 1) div 256"))
        .select(col("px"), col("py"), col("cnt"), col("hd"), col("file_id"))
        .repartition(col("file_id"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("file_id").saveAsTable(tbl)
      tag
    })
    tbl
  }

  /** Hilbert-layout skipping audit over WRITTEN files (r17 — the
    * writer face the modeled audits plan for: [[layoutHilbert]]
    * measured the Hilbert curve's pruning win on MODELED 256-cell
    * files; this face actually WRITES the layout — a partitioned
    * parquet table, one physical file per 256-cell Hilbert range,
    * real row-group zone maps on disk — then runs the identical
    * 4-box probe against zone maps derived from the files READ BACK,
    * never from the model). The oracle is the modeled audit's
    * hilbert rows, so the hash match proves the written layout
    * delivers exactly the skipping the model promised; the spec
    * additionally opens the parquet FOOTERS and pins each file's
    * min/max stats to the audit's zone maps.
    *
    * == Scale design ==
    * The write is the [[layoutZorder]] scale note made concrete: one
    * rasterize fold, the two-phase range rank on the canvas-bounded
    * cell relation, one hash shuffle into file-sized tasks. The audit
    * reads the bounded written relation (≤1.4M cells) once; file
    * summaries and the probe are broadcast-sized.
    */
  def layoutHilbertWrite(s: SparkSession, dir: String): DataFrame = {
    val t = s.table(ensureHilbertLayout(s, dir))
    val files = t.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_cells"),
        min(col("px")).as("fx0"), max(col("px")).as("fx1"),
        min(col("py")).as("fy0"), max(col("py")).as("fy1"))
    val boxes = s.range(1).select(expr(skipBoxes))
    val matching = t.crossJoin(broadcast(boxes))
      .filter(col("px") >= col("bx0") && col("px") <= col("bx1") &&
        col("py") >= col("by0") && col("py") <= col("by1"))
      .groupBy(col("box_id"))
      .agg(count(lit(1)).as("cells_matching"))
    files.crossJoin(broadcast(boxes))
      .withColumn("files_total", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("box_id"))))
      .filter(col("fx1") >= col("bx0") && col("fx0") <= col("bx1") &&
        col("fy1") >= col("by0") && col("fy0") <= col("by1"))
      .groupBy(col("box_id"), col("files_total"))
      .agg(count(lit(1)).as("files_touched"),
        sum(col("n_cells")).as("cells_scanned"))
      .join(broadcast(matching), Seq("box_id"))
      .select(lit("hilbert").as("layout"), col("box_id"), col("files_total"),
        col("files_touched"), col("cells_scanned"), col("cells_matching"),
        expr("(1000000 * cells_scanned) div greatest(cells_matching, 1)")
          .as("read_amp_ppm"))
      .orderBy(col("box_id"))
  }

  /** DuckDB twin: the MODELED hilbert audit restricted to its hilbert
    * rows — written layout ≡ model is exactly the claim. */
  val layoutHilbertWriteSql: String =
    s"""SELECT * FROM ($layoutHilbertSql) WHERE layout = 'hilbert'
       |ORDER BY box_id""".stripMargin

  // ------------------------------------------------------ tile pyramid
  /** Multi-zoom tile pre-aggregation (r14 wave 19) — the tile-SERVING
    * face of the rasterizer: a slippy-map client asks for count tiles
    * at whatever zoom it is at, and recomputing the aggregation per
    * zoom would re-scan the corpus once per level. This face bins the
    * bbox-filtered points ONCE at the finest zoom (z = 5, a 32×32
    * grid) and derives every coarser level by integer halving of the
    * base tile coordinates (tx_z = tx₅ div 2^(5−z)) — the parent/child
    * relation real tile pyramids use. Deriving (never re-binning)
    * makes cross-zoom conservation hold BY CONSTRUCTION and dodges the
    * float-edge trap: a point on a tile boundary could bin differently
    * when the float bin width changes per zoom, silently breaking
    * parent = Σ children.
    *
    * == Scale design ==
    * ONE scan reduces to the ≤ 4^5 base tiles (bounded key space ⇒
    * map-side combine absorbs the corpus); the 6-level rollup is a
    * broadcast cross join + re-aggregate on that ≤1024-row relation.
    * At 100 TB the base binning is the only corpus-sized reduce; a
    * deeper pyramid just raises the bounded key count (4^z).
    */
  def geoTilePyramid(s: SparkSession, dir: String): DataFrame = {
    val N = 32 // 2^5
    val base = points(s, dir).select(col("event_id"), mercX, mercY)
      .filter(col("x") >= X0 && col("x") <= X1 && col("y") >= Y0 && col("y") <= Y1)
      .select(
        least(floor((col("x") - X0) / (X1 - X0) * N), lit(N - 1)).cast("long").as("bx"),
        least(floor((col("y") - Y0) / (Y1 - Y0) * N), lit(N - 1)).cast("long").as("by"))
      .groupBy("bx", "by").agg(count(lit(1)).as("cnt"))
    import s.implicits._
    val zooms = Seq((0L, 32L), (1L, 16L), (2L, 8L), (3L, 4L), (4L, 2L), (5L, 1L))
      .toDF("zoom", "d")
    base.crossJoin(broadcast(zooms))
      .select(col("zoom"), expr("bx div d").as("tx"), expr("by div d").as("ty"),
        col("cnt"))
      .groupBy("zoom", "tx", "ty").agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("zoom"), col("tx"), col("ty"))
  }

  val geoTilePyramidSql: String =
    s"""WITH $pointsCte, $mercCte,
       |base AS (
       |  SELECT CAST(least(floor((x - ($X0)) / (${X1 - X0}) * 32), 31) AS BIGINT) AS bx,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * 32), 31) AS BIGINT) AS by,
       |    count(*) AS cnt
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2),
       |zooms(zoom, d) AS (VALUES (0, 32), (1, 16), (2, 8), (3, 4), (4, 2), (5, 1))
       |SELECT CAST(zoom AS BIGINT) AS zoom, bx // d AS tx, by // d AS ty,
       |  CAST(sum(cnt) AS BIGINT) AS cnt
       |FROM base, zooms GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------ tile serve
  /** Tile-serving planner (r17) — [[geoTilePyramid]]'s READ path, the
    * face that proves the pyramid's purpose: a slippy-map client asks
    * for a VIEWPORT at a display budget, and the server must pick the
    * zoom, enumerate the covering tiles, and account for what the
    * over-read costs. Four fixed viewports in base-cell coordinates
    * (the [[layoutSkippingEval]] four-box harness applied to serving):
    * center 8², corner 8², wide 24², and a full-width strip. Per
    * viewport the planner picks the DEEPEST zoom whose covering-tile
    * span is ≤ 4 per axis (the client's 4×4 tile budget), reads
    * exactly the covering tiles from the pyramid, and emits the plan
    * ledger: chosen zoom + tile size, tiles read, point mass served,
    * the viewport-exact mass (zoom-5 base cells inside the viewport —
    * the pyramid's own finest level, so exactness is by construction),
    * and the edge-overhang in exact ppm (served ≥ exact because tiles
    * overhang viewport edges — the read-amplification the budget
    * trades for fewer requests).
    *
    * == Scale design ==
    * Every relation here is pyramid-bounded (≤ Σ4^z = 1365 rows after
    * the corpus-absorbing base fold): the 4×6 viewport × zoom plan
    * grid, the covering-tile range joins and the ledger are all
    * broadcast work. The corpus is touched exactly once — inside
    * [[geoTilePyramid]]'s map-side base fold.
    */
  def geoTileServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.Checkpoints.StableSyntax
    val pyr = geoTilePyramid(s, dir).stableCheckpoint()
    val vps = Seq(
      ("center", 12L, 19L, 12L, 19L),
      ("corner", 0L, 7L, 0L, 7L),
      ("strip", 0L, 31L, 14L, 17L),
      ("wide", 4L, 27L, 4L, 27L))
      .toDF("viewport", "bx0", "bx1", "by0", "by1")
    val zooms = Seq((0L, 32L), (1L, 16L), (2L, 8L), (3L, 4L), (4L, 2L), (5L, 1L))
      .toDF("zoom", "d")
    // deepest zoom whose covering span fits the 4x4 tile budget
    val plan = vps.crossJoin(broadcast(zooms))
      .filter(expr("bx1 div d - bx0 div d + 1 <= 4 AND by1 div d - by0 div d + 1 <= 4"))
      .groupBy(col("viewport"), col("bx0"), col("bx1"), col("by0"), col("by1"))
      .agg(max(struct(col("zoom"), col("d"))).as("z"))
      .select(col("viewport"), col("bx0"), col("bx1"), col("by0"), col("by1"),
        col("z.zoom").as("zoom"), col("z.d").as("d"))
    val tiles = pyr.select(col("zoom").as("pz"), col("tx").as("ptx"),
      col("ty").as("pty"), col("cnt").as("pcnt"))
    val served = plan.join(broadcast(tiles),
        col("pz") === col("zoom") &&
          col("ptx").between(expr("bx0 div d"), expr("bx1 div d")) &&
          col("pty").between(expr("by0 div d"), expr("by1 div d")))
      .groupBy(col("viewport"))
      .agg(count(lit(1)).as("tiles_read"), sum(col("pcnt")).as("mass_served"))
    val exact = plan.join(broadcast(tiles.filter(col("pz") === 5L)),
        col("ptx").between(col("bx0"), col("bx1")) &&
          col("pty").between(col("by0"), col("by1")))
      .groupBy(col("viewport"))
      .agg(sum(col("pcnt")).as("mass_exact"))
    plan.select(col("viewport"), col("zoom"), col("d"))
      .join(broadcast(served), Seq("viewport"))
      .join(broadcast(exact), Seq("viewport"))
      .select(col("viewport"), col("zoom"), col("d"), col("tiles_read"),
        col("mass_served"), col("mass_exact"),
        expr("1000000 * (mass_served - mass_exact) div greatest(mass_served, 1)")
          .as("overhang_ppm"))
      .orderBy(col("viewport"))
  }

  /** DuckDB twin: the pyramid CTE, viewport VALUES, the same deepest-
    * fitting-zoom argmax, covering-tile range joins, exact ppm. */
  val geoTileServeSql: String =
    s"""WITH $pointsCte, $mercCte,
       |base AS (
       |  SELECT CAST(least(floor((x - ($X0)) / (${X1 - X0}) * 32), 31) AS BIGINT) AS bx,
       |    CAST(least(floor((y - ($Y0)) / (${Y1 - Y0}) * 32), 31) AS BIGINT) AS by,
       |    count(*) AS cnt
       |  FROM merc
       |  WHERE x >= $X0 AND x <= $X1 AND y >= $Y0 AND y <= $Y1
       |  GROUP BY 1, 2),
       |zooms(zoom, d) AS (VALUES (0, 32), (1, 16), (2, 8), (3, 4), (4, 2), (5, 1)),
       |pyr AS (SELECT CAST(zoom AS BIGINT) AS zoom, bx // d AS tx, by // d AS ty,
       |    CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM base, zooms GROUP BY 1, 2, 3),
       |vps(viewport, bx0, bx1, by0, by1) AS (VALUES
       |  ('center', 12, 19, 12, 19), ('corner', 0, 7, 0, 7),
       |  ('strip', 0, 31, 14, 17), ('wide', 4, 27, 4, 27)),
       |plan AS (SELECT viewport, bx0, bx1, by0, by1,
       |    CAST(max(zoom) AS BIGINT) AS zoom
       |  FROM vps, zooms
       |  WHERE bx1 // d - bx0 // d + 1 <= 4 AND by1 // d - by0 // d + 1 <= 4
       |  GROUP BY 1, 2, 3, 4, 5),
       |pland AS (SELECT plan.*, CAST(z.d AS BIGINT) AS d
       |  FROM plan JOIN zooms z ON z.zoom = plan.zoom),
       |served AS (SELECT viewport, CAST(count(*) AS BIGINT) AS tiles_read,
       |    CAST(sum(p.cnt) AS BIGINT) AS mass_served
       |  FROM pland JOIN pyr p ON p.zoom = pland.zoom
       |    AND p.tx BETWEEN bx0 // d AND bx1 // d
       |    AND p.ty BETWEEN by0 // d AND by1 // d
       |  GROUP BY 1),
       |ex AS (SELECT viewport, CAST(sum(p.cnt) AS BIGINT) AS mass_exact
       |  FROM pland JOIN pyr p ON p.zoom = 5
       |    AND p.tx BETWEEN bx0 AND bx1 AND p.ty BETWEEN by0 AND by1
       |  GROUP BY 1)
       |SELECT pland.viewport, zoom, d, tiles_read, mass_served, mass_exact,
       |  1000000 * (mass_served - mass_exact) // greatest(mass_served, 1)
       |    AS overhang_ppm
       |FROM pland JOIN served USING (viewport) JOIN ex USING (viewport)
       |ORDER BY viewport""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_tile_serve" -> geoTileServe,
    "geo_tile_pyramid" -> geoTilePyramid,
    "layout_hilbert" -> layoutHilbert,
    "layout_hilbert_write" -> layoutHilbertWrite,
    "layout_skipping_eval" -> layoutSkippingEval,
    "layout_zorder" -> layoutZorder,
    "geo_mercator" -> geoMercator,
    "geo_bbox_filter" -> geoBboxFilter,
    "geo_rasterize" -> geoRasterize,
    "geo_frame_churn" -> geoFrameChurn,
    "pipeline_frame_build" -> pipelineFrameBuild,
    "pipeline_frame_incremental" -> pipelineFrameIncremental,
    "pipeline_job_build" -> pipelineJobBuild,
    "pipeline_job_incremental" -> pipelineJobIncremental,
    "geo_spread" -> geoSpread,
    "geo_shade_eqhist" -> geoShadeEqhist,
    "geo_shade_rgb" -> geoShadeRgb,
    "map_fanout" -> mapFanout,
    "reduce_assemble" -> reduceAssemble)

  val oracles: Map[String, String] = Map(
    "geo_tile_serve" -> geoTileServeSql,
    "geo_tile_pyramid" -> geoTilePyramidSql,
    "layout_hilbert" -> layoutHilbertSql,
    "layout_hilbert_write" -> layoutHilbertWriteSql,
    "layout_skipping_eval" -> layoutSkippingEvalSql,
    "layout_zorder" -> layoutZorderSql,
    "geo_mercator" -> geoMercatorSql,
    "geo_bbox_filter" -> geoBboxFilterSql,
    "geo_rasterize" -> geoRasterizeSql,
    "geo_frame_churn" -> geoFrameChurnSql,
    "pipeline_frame_build" -> pipelineFrameBuildSql,
    "pipeline_frame_incremental" -> pipelineFrameIncrementalSql,
    "pipeline_job_build" -> pipelineJobBuildSql,
    "pipeline_job_incremental" -> pipelineJobIncrementalSql,
    "geo_spread" -> geoSpreadSql,
    "geo_shade_eqhist" -> geoShadeEqhistSql,
    "geo_shade_rgb" -> geoShadeRgbSql,
    "map_fanout" -> mapFanoutSql,
    "reduce_assemble" -> reduceAssembleSql)
}
