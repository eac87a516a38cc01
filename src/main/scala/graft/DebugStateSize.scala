package graft
/** Measures the UnsafeRow encoder size of every FMGWS state class —
  * the measured basis for stream_state_budget's bytes/key constants
  * (constant = measured row + ~48 B store key/version overhead).
  * Usage: runMain graft.DebugStateSize
  */
object DebugStateSize {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 2)
    import graft.streaming.EventStreams._
    def sz[T](v: T)(implicit e: org.apache.spark.sql.Encoder[T]): Int = {
      val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        e.asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[T]])
      enc.createSerializer()(v).asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow].getSizeInBytes
    }
    import spark.implicits._
    println("SESS " + sz(SessState(1L, 2L, 3L, 4L, 5L)))
    println("RET31 " + sz(RetState(1, (0 until 31).toList)))
    println("FUN " + sz(FunState(1L, 2L, 3L)))
    println("HWM " + sz(HwmState(1L)))
    println("AB " + sz(AbState(true, false)))
    println("UP " + sz(UpState(1L, true, false, 2L)))
    println("DID " + sz(DidState(1L, true)))
    println("ATTR " + sz("v:12345678,c:23456789,p:34567890"))
    println("UPSERT " + sz(UpsertState(1L, 2L)))
    println("SCD2 " + sz(Scd2State(1L, 2L, 3L, 4L)))
    println("CHANGE " + sz(ChangeState(1L, 2L, true)))
    println("FC " + sz(FcState(1L, 2L, 3L)))
    println("CUSUM " + sz(CusumState(1L)))
    println("CELL " + sz(CellState(1L, 2L)))
    println("ANOM " + sz(AnomState(1L, 2L, "abcdefghij")))
    println("DAU " + sz(new Array[Long](64)))
    println("QUANT50 " + sz((0 until 50).map(i => i.toLong -> i.toLong).toMap))
    spark.stop()
  }
}
