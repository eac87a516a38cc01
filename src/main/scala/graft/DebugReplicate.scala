package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Replicate an sf corpus K× into a scratch dir so the bench can
  * measure a SCALING SLOPE instead of asserting 100×-safety statically
  * (VERDICT r4 #2). Replication is copy-isomorphic, not naive:
  *
  *  - dims (region/nation/supplier/part) stay fixed — dims grow slower
  *    than facts at real scale;
  *  - fact ids shift per copy (orders/customer keys consistently, so
  *    join semantics are preserved; users shift so per-user series stay
  *    the same length and only their COUNT grows);
  *  - documents get a per-copy token bijection (every word suffixed
  *    with the copy tag): each copy is an isomorphic but DISJOINT
  *    corpus — within-copy near-dup/shingle structure is exactly
  *    preserved while cross-copy candidate pairs are zero. Naive text
  *    copies would make every doc a 10-way exact dup and measure a
  *    replica artifact (quadratic pair blowup) instead of scaling;
  *  - embeddings rotate by the copy index: rotations of isotropic
  *    noise are near-orthogonal, so no artificial cross-copy near-dup
  *    pairs; copy 0 is untouched, keeping the IVF seed codebook
  *    (vec_id < CELLS) and the ANN query set (vec_id < NQ) intact.
  *
  * Usage: runMain graft.DebugReplicate <srcSfDir> <dstDir> <factor>
  */
object DebugReplicate {
  def main(args: Array[String]): Unit = {
    val (src, dst, k) = (args(0), args(1), args(2).toInt)
    val spark = GraftSession.local()
    val CUST = 1000000L; val ORD = 10000000L
    val EV = 10000000L; val USR = 1000000L
    val DOC = 1000000L; val VEC = 1000000L

    Seq("region", "nation", "supplier", "part").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.load(spark, src, name)
      (0 until k).map(i => f(base, i)).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[replicate] $name x$k -> $dst")
    }
    rep("customer")((df, i) => df
      .withColumn("c_custkey", col("c_custkey") + lit(i * CUST)))
    rep("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * ORD))
      .withColumn("o_custkey", col("o_custkey") + lit(i * CUST)))
    rep("lineitem")((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * ORD)))
    rep("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * EV))
      .withColumn("user_id", col("user_id") + lit(i * USR)))
    rep("documents")((df, i) =>
      (if (i == 0) df
       else df.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1x" + i)))
        .withColumn("doc_id", col("doc_id") + lit(i * DOC)))
    // rotation amount wraps mod 63 (1..63 shift positions on the
    // 64-dim vectors): a raw `i` shift goes NEGATIVE-length past
    // i = 64 and silently produced an EMPTY embeddings table at
    // k = 100 (r11). A bare wrap left copies 63 apart (i and i+63)
    // BIT-IDENTICAL — every source vector gained one cosine-1.0
    // planted pair per wrap, inflating dedup pair counts at k >= 64
    // (r11 ADVICE). Odd wraps now also NEGATE the vector: same-source
    // copies across adjacent wraps land at cosine −1, which no
    // positive near-dup threshold crosses. Distinct-wrap copies repeat
    // an orientation only at wrap distance 2 (i and i+126): decade
    // measurements stay planted-pair-free through k = 126.
    rep("embeddings")((df, i) => {
      val r = i % 63
      val rot = if (r == 0) df
        else df.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, 64 - r), slice(col("embedding"), 1, r)))
      (if ((i / 63) % 2 == 0) rot
       else rot.withColumn("embedding",
         transform(col("embedding"), x => -x)))
        .withColumn("vec_id", col("vec_id") + lit(i * VEC))
    })
    spark.stop()
  }
}
