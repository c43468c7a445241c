package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Complete, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst extension: scale-mode rewrite of exact set-based distinct
  * counts into HyperLogLog++ sketches.
  *
  * The reference computes windowed distinct counts by accumulating
  * `HashSet`s inside its reduce functions and sizing them at finalize
  * (`app/dws/ProductStatsApp.java:225-256`) — exact, but O(distinct keys)
  * state per group. The engine mirrors that exactly with
  * `size(collect_set(x))` (oracle-verified). At 100 TB the exact set is the
  * wrong trade: this rule rewrites `size(collect_set(x))` aggregates to
  * `approx_count_distinct(x)` when `spark.graft.approxDistinct=true`,
  * turning per-group state from O(n) to O(1) sketch registers without
  * touching query code.
  *
  * Registered via `SparkSessionExtensions` (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`) or
  * programmatically: `GraftSession.builder().withExtensions(...)`.
  */
class ApproxDistinctRule extends Rule[LogicalPlan] {

  // specific flag wins; otherwise the one-switch profile flag
  // spark.graft.scaleMode enables every sketch rewrite at once
  private def enabled: Boolean =
    conf.getConfString("spark.graft.approxDistinct",
      conf.getConfString("spark.graft.scaleMode", "false")).toBoolean

  private def hll(child: Expression, filter: Option[Expression]): Expression =
    AggregateExpression(HyperLogLogPlusPlus(child), Complete, isDistinct = false, filter)

  private object SizeOfCollectSet {
    def unapply(e: Expression): Option[(Expression, Option[Expression])] = e match {
      case Size(AggregateExpression(CollectSet(child, _, _), _, false, filter, _), _) =>
        Some((child, filter))
      case _ => None
    }
  }

  private def rewrite(e: Expression): Expression = e match {
    // HLL already yields LongType: collapse an enclosing cast-to-long rather
    // than stacking Cast(Cast(hll, int), long) — the Int hop would overflow
    // (or throw under ANSI) at the >2^31-distinct group sizes this
    // scale-mode rule exists for.
    case Cast(SizeOfCollectSet(child, filter), LongType, _, _) => hll(child, filter)
    case Cast(SizeOfCollectSet(child, filter), dt, tz, ansi) => Cast(hll(child, filter), dt, tz, ansi)
    case Cast(inner, dt, tz, ansi) => Cast(rewrite(inner), dt, tz, ansi)
    // Bare size(collect_set) consumers require IntegerType — narrow only here.
    case SizeOfCollectSet(child, filter) =>
      Cast(hll(child, filter), org.apache.spark.sql.types.IntegerType)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(_, aggExprs, _, _) =>
        val rewritten = aggExprs.map { ne =>
          ne match {
            case a @ Alias(child, name) =>
              val r = rewrite(child)
              if (r fastEquals child) a
              else Alias(r, name)(a.exprId, a.qualifier, a.explicitMetadata,
                a.nonInheritableMetadataKeys)
            case other => other
          }
        }
        agg.copy(aggregateExpressions = rewritten)
    }
}

/** Scale-mode rewrite of exact interpolated percentiles into t-digest
  * sketches: `percentile(x, p)` keeps O(n) per-group state (it buffers
  * every value), the wrong trade at 100 TB; under
  * `spark.graft.approxPercentile=true` it becomes
  * `approx_percentile(x, p)` (bounded sketch state, same result shape) —
  * the same swap pattern as `ApproxDistinctRule` for distinct counts.
  * Only frequency-1 percentiles (the common form) are rewritten.
  */
class ApproxPercentileRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def enabled: Boolean =
    conf.getConfString("spark.graft.approxPercentile",
      conf.getConfString("spark.graft.scaleMode", "false")).toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Percentile(child, pct, Literal(1L, _), _, _, false), _, false, _, _) =>
            ae.copy(aggregateFunction = new ApproximatePercentile(child, pct,
              Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)))
        }
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.plans.expr._

  private def fn(name: String, arity: Int, build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
        build(args)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new ApproxDistinctRule)
    ext.injectOptimizerRule(_ => new ApproxPercentileRule)
    // Native codegen kernels (see graft.plans.expr) as SQL functions, so
    // both the column API (call_function) and spark.sql can use them.
    ext.injectFunction(fn("graft_tokenize", 1, a => TokenizeWords(a(0))))
    ext.injectFunction(fn("graft_dot", 2, a => ArrayDot(a(0), a(1))))
    ext.injectFunction(fn("graft_eq_count", 2, a => ArrayEqCount(a(0), a(1))))
    ext.injectFunction(fn("graft_pq_adc", 3, a => PqAdcSum(a(0), a(1), a(2))))
    ext.injectFunction(fn("graft_pq_encode", 4, a => PqEncode(a(0), a(1), a(2), a(3))))
    ext.injectFunction(fn("graft_max_ngram_ct", 2, a => MaxNgramCount(a(0), a(1))))
    ext.injectFunction(fn("graft_ngrams", 2, a => NgramArray(a(0), a(1))))
    ext.injectFunction(fn("graft_winnow", 3, a => WinnowFingerprints(a(0), a(1), a(2))))
    ext.injectFunction(fn("graft_bag_intersect", 2, a => BagIntersect(a(0), a(1))))
    ext.injectFunction(fn("graft_bag_counts", 1, a => BagCounts(a(0))))
    ext.injectFunction(fn("graft_bag_intersect_counts", 2, a => BagIntersectCounts(a(0), a(1))))
    ext.injectFunction(fn("graft_bag_jaccard", 4, a => BagJaccard(a(0), a(1), a(2), a(3))))
    ext.injectFunction(fn("graft_bag_overlap", 4, a => BagOverlap(a(0), a(1), a(2), a(3))))
    ext.injectFunction(fn("graft_prefix_tokens", 2, a => PrefixTokens(a(0), a(1))))
    ext.injectFunction(fn("graft_prefix_tokens_vocab", 3,
      a => PrefixTokensVocab(a(0), a(1), a(2))))
    ext.injectFunction(fn("graft_norm", 1, a => ArrayNorm(a(0))))
    ext.injectFunction(fn("graft_hash_tokens", 1, a => HashTokens(a(0))))
    ext.injectFunction(fn("graft_shingles", 1, a => ShingleHashes(a(0))))
    ext.injectFunction(fn("graft_minhash", 1, a => MinHashSig(a(0))))
    ext.injectFunction(fn("graft_simhash32", 1, a => SimHash32(a(0))))
    ext.injectFunction(fn("graft_char_entropy", 1, a => CharEntropy(a(0))))
    // Spark's own runtime-filter bloom expressions, surfaced as callable
    // functions so an explicit semi-join reduction can build/apply the
    // filter where the optimizer's injection heuristics don't reach
    // (Relational.bloomPruneSemiJoin). Pure re-exposure — the sketch,
    // aggregation, and codegen'd membership probe are Spark's.
    ext.injectFunction(fn("graft_bloom_agg", 2,
      a => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        a(0), a(1))))
    ext.injectFunction(fn("graft_bloom_might_contain", 2,
      a => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(a(0), a(1))))
  }
}
