package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.Checkpoints.StableSyntax

/** Shared helpers for the Analytics operator family (split from the
  * single Analytics.scala in r17 — pure refactor, zero semantic change).
  * Table loading, the integer-cents exact-money contract, timestamp
  * formatting, and the two-phase global row-rank used by the
  * distribution faces. See [[Analytics]] for the family contract.
  */
trait AnalyticsBase {
  /** Exact integer cents from a 2-decimal double column. */
  private[operators] def cents(c: Column): Column = round(c * 100).cast("long")

  private[operators] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events.ts arrives as parquet ns (NTZ); normalize to session-TZ
    * TIMESTAMP so unix_micros etc. work. Session TZ is UTC, so the
    * wall-clock value DuckDB sees is identical.
    */
  private[operators] def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts", col("ts").cast("timestamp"))

  private[operators] def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  private[operators] def fmtDay(c: Column): Column = date_format(c, "yyyy-MM-dd")

  // ---------------------------------------------------------------- q1
  /** Global 1-based row position (within each `partKeys` group) under a
    * total `order`, WITHOUT sorting any group in a single task:
    *
    *   phase 1  range-repartition on (partKeys ++ order): each of the
    *            P range tasks owns a contiguous slice of the total
    *            order, so a task-local row_number is globally
    *            consistent once offset;
    *   phase 2  per-(range-slice, group) counts — a map-side-combinable
    *            O(P·G) ledger — self-joined triangularly
    *            (`b.slice < a.slice`) into per-slice start offsets,
    *            broadcast back onto the rows; global position =
    *            slice offset + local row number.
    *
    * No unpartitioned Window anywhere (the offset ledger is built by a
    * bounded join+agg, not a window) and no collect: parallelism is P
    * regardless of the group alphabet, so the plan survives a 5-value
    * partition alphabet — or no partition key at all — over 100 TB,
    * where `Window.partitionBy(lowCardinality).orderBy(...)` would
    * funnel corpus/G rows into one sort task. Costs one extra hash
    * shuffle (the local row_number re-clusters by slice id) on top of
    * the range exchange; both shuffles are ~evenly spread by
    * construction. Position values are boundary-independent (ties are
    * broken inside `order`, which must be a total order), so WHERE the
    * sampled range boundaries land never changes the result — but all
    * three consumers of `ranged` below (the local row_number, the count
    * ledger, and its triangular self-join) must observe the SAME
    * boundaries. RangePartitioner's reservoir seed incorporates the
    * RDD id, so three INDEPENDENT executions of the range exchange
    * could draw different boundaries and positions would silently
    * corrupt. Through round 10 that single-materialization guarantee
    * was delegated to exchange reuse (AQE stage cache / ReuseExchange)
    * plus a conf `require` — an optimizer best-effort, not a
    * contract: any rule that differentiates the three subtrees before
    * canonicalization breaks it with no error, only wrong answers.
    * Now the guarantee is STRUCTURAL: `ranged` (with its slice id
    * already stamped) is eagerly local-checkpointed, so the range
    * shuffle + boundary draw run exactly once and every consumer scans
    * the one materialized RDD — `spark.sql.exchange.reuse` can be OFF
    * and positions stay correct (PlanShapeSpec pins both the shared-RDD
    * plan shape and reuse-off equivalence). Cost: the checkpoint
    * stores the sliced relation once in executor block storage —
    * the same order of I/O the reused shuffle files already paid, and
    * both call sites feed globalRowPos an already-aggregated relation
    * (per-user / per-order rows, not the raw corpus), so the stored
    * footprint is corpus-sublinear. ContextCleaner frees the blocks
    * when the DataFrame is GC'd — no unpersist bookkeeping. Trade-off
    * (documented, accepted): localCheckpoint truncates lineage, so an
    * executor loss during downstream stages fails the job instead of
    * recomputing — acceptable for a deterministic batch operator whose
    * retry is the job itself; a CacheManager persist would keep
    * lineage but leak storage with no structural unpersist point.
    * On clusters where executor loss is routine, set
    * `spark.graft.checkpointDir` to a durable path and every stable
    * checkpoint (here and in the graph family) routes through
    * reliable `checkpoint()` instead — see [[graft.plans.Checkpoints]];
    * results are bit-identical either way (spec-pinned).
    * NOTE the eager checkpoint makes DataFrame CONSTRUCTION itself run
    * the upstream Spark jobs: merely building a rank-backed query (for
    * plan inspection, explain, oracle-only paths) executes work, and
    * bench timing attribution shifts from first action to plan build.
    * Plan-only tooling should introspect with planOf-style helpers
    * aware that the subtree below the checkpoint is already spent.
    */
  private[operators] def globalRowPos(df: DataFrame, partKeys: Seq[String],
      order: Seq[Column], pos: String, total: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val pid = s"__slice_$pos"
    val lrow = s"__lrow_$pos"
    val ranged = df
      .repartitionByRange(p, partKeys.map(col) ++ order: _*)
      .withColumn(pid, spark_partition_id())
      .stableCheckpoint()
    val wLoc = Window.partitionBy((pid +: partKeys).map(col): _*)
      .orderBy(order: _*)
    val local = ranged.withColumn(lrow, row_number().over(wLoc))
    val cnt = ranged.groupBy((pid +: partKeys).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val tot = cnt.groupBy(partKeys.map(col): _*)
      .agg(sum(col("__cnt")).as(total))
    val offCond = partKeys
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .foldLeft(col(s"b.$pid") < col(s"a.$pid"))(_ && _)
    val off = cnt.as("a").join(cnt.as("b"), offCond, "left_outer")
      .groupBy((pid +: partKeys).map(k => col(s"a.$k")): _*)
      .agg(coalesce(sum(col(s"b.__cnt")), lit(0L)).as("__off"))
    val ledger =
      if (partKeys.isEmpty) off.crossJoin(tot)
      else off.join(tot, partKeys)
    local.join(broadcast(ledger), pid +: partKeys)
      .withColumn(pos, col("__off") + col(lrow))
      .drop(pid, lrow, "__off")
  }

  /** SQL-standard `ntile(k)` reconstructed arithmetically from a global
    * row position and group size n: the first (n mod k) buckets carry
    * ceil(n/k) rows, the rest floor(n/k). Pure integer `div`/`%` —
    * no doubles, so no floor-of-almost-integer hazard — cross-engine
    * exact at any n.
    *
    * Division-by-zero safety when total < k rests on CASE's LAZY
    * evaluation: total < k implies pos <= total <= (total % k), so the
    * WHEN branch (whose divisor `(total div k) + 1` is always >= 1)
    * is taken and the ELSE branch's `div (total div k)` — zero in that
    * regime — is never evaluated. A refactor to eager arithmetic
    * (e.g. least/greatest over both branches) would reintroduce the
    * divide-by-zero; keep the guard structural.
    */
  private[operators] def ntileAt(pos: String, total: String, k: Int): Column =
    expr(
      s"""CASE WHEN $pos <= ($total % $k) * (($total div $k) + 1)
         |THEN (($pos - 1) div (($total div $k) + 1)) + 1
         |ELSE ($total % $k)
         |  + (($pos - ($total % $k) * (($total div $k) + 1) - 1) div ($total div $k)) + 1
         |END""".stripMargin)
}
