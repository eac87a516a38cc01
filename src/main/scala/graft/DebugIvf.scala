package graft

/** IVF tuning probe: recall@5 and scanned-corpus fraction per nprobe,
  * for the trained vs seed codebook. Usage: runMain graft.DebugIvf <sfDir>
  */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(cpus = 8)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    def dotd(a: Array[Float], b: Array[Float]): Double =
      graft.functions.VecMath.dot(a, b)
    def nrm(v: Array[Float]): Double = graft.functions.VecMath.nrm(v)
    val seeds = e.filter(_._1 < 16).sortBy(_._1).map { case (id, v) => (id, v, nrm(v)) }
    // exact top-5 per query (vec_id < 10)
    val queries = e.filter(_._1 < 10)
    val exact = queries.map { case (qid, qv) =>
      val qn = nrm(qv)
      qid -> e.filter(_._1 != qid)
        .map { case (cid2, cv) => (cid2, dotd(qv, cv) / (qn * nrm(cv))) }
        .sortBy { case (cid2, cos) => (-cos, cid2) }.take(5).map(_._1).toSet
    }.toMap
    def evalCb(name: String, cb: Array[(Long, Array[Float], Double)],
               assignK: Int = 1): Unit = {
      def cells(v: Array[Float], n: Double, k: Int): Seq[Long] =
        cb.map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
          .sortBy { case (cid, cos) => (-cos, cid) }.take(k).map(_._1).toSeq
      val assign = e.map { case (id, v) => id -> cells(v, nrm(v), assignK).toSet }.toMap
      val cellSizes = assign.toSeq.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      for (np <- Seq(1, 2, 3, 4, 6, 8)) {
        var hit = 0; var scanned = 0L
        queries.foreach { case (qid, qv) =>
          val probed = cells(qv, nrm(qv), np).toSet
          scanned += probed.toSeq.map(c => cellSizes.getOrElse(c, 0)).sum
          val cand = e.filter { case (id, _) => id != qid && probed.exists(assign(id)) }
          val qn = nrm(qv)
          val top = cand.map { case (id, v) => (id, dotd(qv, v) / (qn * nrm(v))) }
            .sortBy { case (id, cos) => (-cos, id) }.take(5).map(_._1)
          hit += top.count(exact(qid))
        }
        val frac = scanned.toDouble / (queries.length.toLong * e.length)
        println(f"[ivf] $name assign=$assignK nprobe=$np recall=${hit / (5.0 * queries.length)}%.3f scanned=${frac}%.3f")
      }
    }
    evalCb("seed16", seeds)
    def train(k: Int): Array[(Long, Array[Float], Double)] = {
      var cb = e.filter(_._1 < k).sortBy(_._1).map { case (id, v) => (id, v, nrm(v)) }
      for (_ <- 1 to 4) {
        val agg = e.map { case (_, v) =>
          val n = nrm(v)
          var bc = -1L; var bcos = Double.MinValue
          cb.foreach { case (cid, cv, cn) =>
            val cos = dotd(v, cv) / (n * cn)
            if (cos > bcos || (cos == bcos && cid < bc)) { bcos = cos; bc = cid }
          }
          (bc, v.map(x => math.round(x / n * 1e6)), 1L)
        }.groupBy(_._1).map { case (cell, rows) =>
          val sums = new Array[Long](rows.map(_._2.length).max)
          rows.foreach(r => (0 until r._2.length).foreach(i => sums(i) += r._2(i)))
          cell -> (sums, rows.length)
        }
        cb = cb.map { case (cid, ov, on) =>
          agg.get(cid) match {
            case Some((sums, cnt)) =>
              val nv = sums.map(x => (x.toDouble / 1e6 / cnt).toFloat)
              (cid, nv, nrm(nv))
            case None => (cid, ov, on)
          }
        }.sortBy(_._1)
      }
      cb
    }
    evalCb("kmeans16", train(16))
    evalCb("kmeans16", train(16), assignK = 2)
    evalCb("kmeans32", train(32), assignK = 2)
    spark.stop()
  }
}
