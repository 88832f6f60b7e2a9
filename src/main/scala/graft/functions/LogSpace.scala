package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Log-space probability arithmetic — the reference's underflow armor
  * (sumLogProbs, reference/assignment4/src/main/RunPageRankBasic.java:570-582)
  * re-expressed as (a) a codegen-friendly column expression for the binary
  * case and (b) a typed `Aggregator` for grouped log-sum-exp.
  *
  * The Aggregator's `merge` IS the reference's combiner (G4): registering it
  * as a UDAF lets Catalyst plan partial aggregation before the shuffle —
  * the map-side combine the reference hand-wires (RunPageRankBasic.java:206-237)
  * comes from the planner.
  */
object LogSpace {

  /** log(exp(a) + exp(b)) without leaving log space:
    * max + log1p(exp(min - max)); identity element is -Inf. */
  def logAdd(a: Column, b: Column): Column = {
    val mx = greatest(a, b)
    val mn = least(a, b)
    when(mn === lit(Double.NegativeInfinity), mx)
      .otherwise(mx + log1p(exp(mn - mx)))
  }

  private[graft] def logAddScalar(a: Double, b: Double): Double = {
    val (mx, mn) = if (a >= b) (a, b) else (b, a)
    if (mn == Double.NegativeInfinity) mx
    else mx + math.log1p(math.exp(mn - mx))
  }

  /** Grouped log-sum-exp: agg(logSumExp(col)) == log(Σ exp(col)). */
  object LogSumExpAgg extends Aggregator[Double, Double, Double] {
    override def zero: Double = Double.NegativeInfinity
    override def reduce(b: Double, a: Double): Double = logAddScalar(b, a)
    override def merge(b1: Double, b2: Double): Double = logAddScalar(b1, b2)
    override def finish(r: Double): Double = r
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handle: `df.agg(logSumExp(col("x")))`. */
  val logSumExp: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(LogSumExpAgg)
}
