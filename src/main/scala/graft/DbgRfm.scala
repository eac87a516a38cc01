package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object DbgRfm {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 4)
    val sf = "/root/testdata/sf0.001"
    val got = graft.operators.Analytics.eventsRfm(spark, sf)
      .select("user_id", "recency_days", "frequency", "monetary", "r_score", "f_score", "m_score")
    val per = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id")).agg(
        max(col("ts")).as("t_last"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("monetary_c"))
    val anchor = per.agg(max(col("t_last")).as("t_max"))
    val want = per.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        datediff(col("t_max").cast("date"), col("t_last").cast("date"))
          .cast("long").as("recency_days"),
        col("frequency"), col("monetary_c"))
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency_days").desc, col("user_id"))).cast("long"))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("frequency"), col("user_id"))).cast("long"))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("monetary_c"), col("user_id"))).cast("long"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        (col("monetary_c")/100.0).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
    println("=== got minus want ===")
    got.except(want).orderBy("user_id").show(20, false)
    println("=== want minus got ===")
    want.except(got).orderBy("user_id").show(20, false)
    spark.stop()
  }
}
