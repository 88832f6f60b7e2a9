package graft.plans

import graft.functions.{HllSketch, KmvSketch}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` into the
  * bounded-state KMV sketch estimate when
  * `spark.graft.approxDistinct.enabled=true` (default off — the rewrite
  * trades exactness for a fixed-size aggregation buffer).
  *
  * Why a Rule and not an API: approximate mode is a PLAN property, not a
  * query rewrite the user should hand-apply — the same query text/DataFrame
  * switches behavior per session, exactly how warehouse engines expose
  * approx-distinct modes. This is the engine's Catalyst `Rule[LogicalPlan]`
  * surface (SURVEY §7.3 found none *required* for reference parity, so the
  * one custom rule is an extension, registered through the same
  * `SparkSessionExtensions` entry point as the kernel functions).
  *
  * Scale: exact distinct shuffles every distinct value per group;
  * the sketch shuffles at most k longs per (group, partition) — the
  * difference between an O(cardinality) and an O(k) buffer at 100 TB.
  *
  * Correctness guardrails: only plain `Count(single child, DISTINCT)`
  * aggregates with no filter clause are rewritten; the estimate is rounded
  * to the nearest long so the column type is unchanged.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val confKey = "spark.graft.approxDistinct.enabled"
  /** Sketch size: distinct counts <= k stay exact; error ~ 1/sqrt(k). */
  val kConfKey = "spark.graft.approxDistinct.k"
  val defaultK = 256
  /** Sketch choice: `kmv` (k longs, exact below k) or `hll` (2^p bytes,
    * p = log2(k) clamped to [7,16] — the floor is HllSketch's alpha-formula
    * validity bound — constant state, never exact). */
  val implConfKey = "spark.graft.approxDistinct.impl"

  private def sketchOver(child: Expression, k: Int, impl: String): Expression = {
    // 60-bit md5 hash of the value (engine-portable, same construction as
    // PipelineOps.hash60), fed to the sketch Aggregator
    val hash = Cast(
      Conv(Substring(Md5(Cast(Cast(child, StringType), BinaryType)),
        Literal(1), Literal(15)), Literal(16), Literal(10)),
      LongType)
    // encoders must be resolved HERE: the analyzer's
    // ResolveEncodersInScalaAgg rule already ran (this rewrite happens at
    // optimization time), so nothing downstream will bind them for us
    val scalaAgg = impl match {
      case "kmv" =>
        ScalaAggregator[Long, Array[Long], Double](
          Seq(hash), new KmvSketch.Agg(k),
          ExpressionEncoder[Long]().resolveAndBind(),
          ExpressionEncoder[Array[Long]]().resolveAndBind(),
          nullable = false, isDeterministic = true)
      case "hll" =>
        // p >= 7: HllSketch's alpha formula needs m >= 128 registers
        val p = math.max(7, math.min(16,
          (63 - java.lang.Long.numberOfLeadingZeros(math.max(k, 16).toLong)).toInt))
        ScalaAggregator[Long, Array[Byte], Double](
          Seq(hash), new HllSketch.Agg(p),
          ExpressionEncoder[Long]().resolveAndBind(),
          ExpressionEncoder[Array[Byte]]().resolveAndBind(),
          nullable = false, isDeterministic = true)
      case other => throw new IllegalArgumentException(
        s"$implConfKey must be kmv or hll, got '$other'")
    }
    // keep the original BIGINT column type; clamp before the cast — a
    // pathological k-th minimum makes the estimate exceed Long range,
    // which would ERROR under ANSI instead of saturating
    Cast(Round(Least(Seq(
      AggregateExpression(scalaAgg, Complete, isDistinct = false),
      Literal(Long.MaxValue.toDouble))),
      Literal(0)), LongType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    val k = conf.getConfString(kConfKey, defaultK.toString).toInt
    require(k >= 2, s"$kConfKey must be >= 2, got $k")
    val impl = conf.getConfString(implConfKey, "kmv")
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Count(Seq(child)), _, true, None, _) if child.resolved =>
            sketchOver(child, k, impl)
        }
    }
  }
}

/** SparkSessionExtensions entry point for the plans package (optimizer
  * rules); function registration lives in graft.functions.GraftExtensions.
  */
class GraftPlanExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
}
