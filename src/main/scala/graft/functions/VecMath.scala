package graft.functions

/** Executor/driver-side exact float-vector scalar math — the SINGLE
  * definition behind every closure-side dot product in the ANN/dedup
  * family (the Column-side twin is the codegen'd [[FloatVectorDot]];
  * use that wherever a `Column` fits — these are for typed closures
  * and driver-side replay where no Column exists). One definition so
  * the assignment tie-breaks and cosine thresholds can never drift
  * between faces. Object methods resolve through the static module
  * reference, so closures calling them serialize nothing extra.
  */
private[graft] object VecMath {

  /** Exact float dot product over the common prefix (min length). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) { d += a(i).toDouble * b(i); i += 1 }
    d
  }

  /** L2 norm over [[dot]]. */
  def nrm(v: Array[Float]): Double = math.sqrt(dot(v, v))
}
