package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom expressions, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works the same as the
  * Column API.
  *
  * Two entry points:
  *  - [[GraftFunctions.register]] — imperative, for an existing session;
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` hook for
  *    `spark.sql.extensions=graft.functions.GraftExtensions`, the
  *    deployment-config route (cluster-wide, no code change).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder) for every SQL-exposed function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> { args => RollingHash(args.head) },
    "simhash64" -> { args => SimHash64(args.head) },
    "unicode_normalize" -> { args =>
      val form = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
          v.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got $other")
      }
      UnicodeNormalize(args.head, form)
    },
    "float_vec_dot" -> { args => FloatVecDot(args(0), args(1)) },
    "deflate_ratio" -> { args => DeflateRatio(args.head) },
    "minhash_band_keys" -> { args =>
      MinHashBandKeys(args(0),
        intArg(args(1), "numBands"), intArg(args(2), "rowsPerBand"))
    },
    // distinct word n-gram hashes straight from the text bytes — the
    // zero-allocation xxhash64(explode(shingles)) (A15-era hot path)
    "word_shingle_hashes" -> { args =>
      WordShingleHashes(args(0), intArg(args(1), "n"))
    },
    // 128-bit gram identity: array<struct<h1,h2>> per text — the
    // pair form for gram-keyed joins at corpus scale (E70)
    "word_shingle_hash_pairs" -> { args =>
      WordShingleHashPairs(args(0), intArg(args(1), "n"))
    },
    // transposition-invariant digit-multiset blocking key (E76)
    "digit_multiset_key" -> { args => DigitMultisetKey(args.head) },
    // content-defined chunking boundaries+hashes (E74)
    "cdc_chunks" -> { args => CdcChunks(args.head) },
    // per-group bounded top-k as SQL: bounded_top_k(expr, k) — the
    // window-free top-k aggregate (ascending child order, struct for
    // compound/descending orderings)
    "bounded_top_k" -> { args =>
      BoundedTopK(args(0), intArg(args(1), "k")).toAggregateExpression()
    },
    // mergeable Datasketches aggregates (value level + sketch level):
    // theta supports set ops across sketches, KLL is the mergeable
    // quantile counterpart of approx_percentile
    "theta_sketch_agg" -> { args =>
      ThetaSketchAgg(args(0), intArg(args(1), "lgK")).toAggregateExpression()
    },
    "theta_union_agg" -> { args =>
      ThetaUnionAgg(args(0), intArg(args(1), "lgK")).toAggregateExpression()
    },
    "kll_agg" -> { args =>
      KllDoublesAgg(args(0), intArg(args(1), "k")).toAggregateExpression()
    },
    "kll_merge_agg" -> { args =>
      KllMergeAgg(args(0), intArg(args(1), "k")).toAggregateExpression()
    },
    // Spark ships these but leaves them out of the SQL registry; the
    // engine exposes them (args: hashed key, estimated items, num bits)
    "bloom_agg" -> { args =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        args(0), args(1), args(2)).toAggregateExpression()
    },
    "bloom_might_contain" -> { args =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))
    },
  )

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

/** `spark.sql.extensions` entry point — the whole library surface a
  * cluster can switch on with one config line: SQL functions, the
  * top-k window rewrite ([[graft.plans.TopKRewrite]]), the bounded
  * range join binning rewrite ([[graft.plans.RangeBinRewrite]]), and
  * the native as-of join planner strategy
  * ([[graft.plans.AsOfJoinStrategy]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinRewrite)
    // cost-based dimension-join reorder (C41): inert without catalog
    // rowCount stats (raw file scans are never touched), so it is safe
    // to switch on cluster-wide
    ext.injectOptimizerRule(_ => graft.plans.DimJoinReorder)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.GlobalRankStrategy)
  }
}
