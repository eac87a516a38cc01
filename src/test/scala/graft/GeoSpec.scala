package graft

import org.apache.spark.sql.functions._
import graft.operators.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("mercator projects a known NYC point correctly") {
    // EPSG:4326 (-74.0060, 40.7128) → EPSG:3857 ≈ (-8238310.24, 4970071.58)
    val df = Seq((1L, -74.0060, 40.7128)).toDF("event_id", "lon", "lat")
      .select(col("event_id"),
        (col("lon") * (20037508.342789244 / 180.0)).as("x"),
        (log(tan((col("lat") + 90.0) * (math.Pi / 360.0))) * 6378137.0).as("y"))
    val (x, y) = df.select("x", "y").as[(Double, Double)].head()
    assert(math.abs(x - -8238310.24) < 0.5, s"x=$x")
    assert(math.abs(y - 4970071.58) < 0.5, s"y=$y")
  }

  test("bbox filter output lies inside the reference bbox") {
    val out = Geo.geoBboxFilter(spark, sf)
    val bad = out.filter(col("x") < -8254332.01 || col("x") > -8209813.49 ||
      col("y") < 4965255.49 || col("y") > 4988769.51)
    assert(out.count() > 0)
    assert(bad.count() == 0)
  }

  test("raster bin counts sum to the bbox point count and px/py are in grid") {
    val raster = Geo.geoRasterize(spark, sf)
    val total = raster.agg(sum("cnt")).as[Long].head()
    assert(total == Geo.geoBboxFilter(spark, sf).count())
    val bad = raster.filter(col("px") < 0 || col("px") > 1399 ||
      col("py") < 0 || col("py") > 999)
    assert(bad.count() == 0)
  }

  test("eq-hist shade is 0..255 and monotone in count") {
    val shade = Geo.geoShadeEqhist(spark, sf).select("cnt", "shade")
      .as[(Long, Int)].collect()
    assert(shade.forall { case (_, s) => s >= 0 && s <= 255 })
    val byCnt = shade.sortBy(_._1).map(_._2)
    assert(byCnt.zip(byCnt.tail).forall { case (a, b) => a <= b })
  }

  test("fan-out frames are sequentially numbered and reduce preserves totals") {
    val frames = Geo.mapFanout(spark, sf).collect()
    assert(frames.map(_.getAs[Long]("frame_seq")).toSeq == (1L to frames.length.toLong))
    val manifest = Geo.reduceAssemble(spark, sf).collect()
    val lastCum = manifest.last.getAs[Long]("cum_points")
    assert(lastCum == frames.map(_.getAs[Long]("n_points")).sum)
    assert(manifest.head.getAs[Long]("total_frames") == frames.length)
  }

  test("layout_skipping_eval: consistent accounting, and z-order prunes the corner boxes harder") {
    val rows = Geo.layoutSkippingEval(spark, sfMid)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 8, "2 layouts x 4 boxes")
    rows.foreach { case (ly, box, total, touched, scanned, matching, amp) =>
      assert(touched >= 1 && touched <= total, s"$ly/$box files")
      assert(scanned >= matching, s"$ly/$box must scan at least the matches")
      assert(amp == 1000000L * scanned / math.max(matching, 1L), s"$ly/$box amp")
    }
    // matching cells are layout-independent
    rows.groupBy(_._2).values.foreach { bs =>
      assert(bs.map(_._6).toSet.size == 1, "cells_matching differs by layout")
    }
    // the designed advantage: on the axis-aligned corner boxes (0 and
    // 3) Morton files are compact rectangles and must touch no more
    // files than the row-major layout
    val byKey = rows.map(r => (r._1, r._2) -> r._4).toMap
    Seq(0L, 3L).foreach { b =>
      assert(byKey(("zorder", b)) <= byKey(("linear", b)),
        s"z-order lost the corner-box pruning on box $b")
    }
  }
}
