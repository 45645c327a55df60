package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{CosineSim, DotF32, HmacSha256Hex, MinHashSketch, MisraGriesAgg, SimHash64Agg, VectorMeanAgg}

/** Registers graft's native expressions as SQL functions on a session.
  *
  * Two paths: `GraftExtensions` for `spark.sql.extensions` users, and
  * `GraftFunctions.register(spark)` for sessions created without the
  * extension (e.g. the driver's Verify/Bench sessions). Registration
  * is idempotent.
  */
object GraftFunctions {
  private[graft] case class Fn(name: String, builder: Seq[Expression] => Expression)

  private[graft] val fns = Seq(
    Fn("hmac_sha256_hex", { args =>
      require(args.length == 2, "hmac_sha256_hex(data, key)")
      HmacSha256Hex(args(0), args(1))
    }),
    Fn("cosine_sim", { args =>
      require(args.length == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    }),
    Fn("dot_f32", { args =>
      require(args.length == 2, "dot_f32(a, b)")
      DotF32(args(0), args(1))
    }),
    // aggregate: the analyzer wraps the returned AggregateFunction
    Fn("minhash_sketch", { args =>
      require(args.length == 2 || args.length == 3,
        "minhash_sketch(h1, h2[, numHashes])")
      val n = if (args.length == 3) args(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sketch numHashes must be an int literal, got $other")
      } else 64
      MinHashSketch(args(0), args(1), n)
    }),
    Fn("simhash64_agg", { args =>
      require(args.length == 1, "simhash64_agg(h)")
      SimHash64Agg(args(0))
    }),
    // thin registry door onto Spark's own codegen'd bloom-membership
    // predicate (the one its runtime row-filtering injects): arg 0
    // must be a FOLDABLE binary (a driver-built filter literal —
    // BloomFilterMightContain type-checks that itself), arg 1 the
    // xxhash64 long being probed
    Fn("bloom_contains", { args =>
      require(args.length == 2, "bloom_contains(filter, value)")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args(0), args(1))
    }),
    Fn("mg_summary", { args =>
      require(args.length == 1 || args.length == 2,
        "mg_summary(token[, capacity])")
      val k = if (args.length == 2) args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"mg_summary capacity must be an int literal, got $other")
      } else 256
      MisraGriesAgg(args(0), k)
    }),
    Fn("vector_mean", { args =>
      require(args.length == 1 || args.length == 2, "vector_mean(v[, dim])")
      val d = if (args.length == 2) args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"vector_mean dim must be an int literal, got $other")
      } else 64
      VectorMeanAgg(args(0), d)
    })
  )

  def register(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { f =>
      val id = FunctionIdentifier(f.name)
      if (!registry.functionExists(id)) {
        registry.registerFunction(
          id,
          new ExpressionInfo("graft", f.name),
          f.builder)
      }
    }
  }
}

/** `spark.sql.extensions=graft.GraftExtensions` entry point.
  *
  * Uses the SAME builder lambdas as `GraftFunctions.register` so both
  * registration paths parse optional literal args identically — e.g.
  * `vector_mean(emb, 128)` and `minhash_sketch(h1, h2, 128)` honor the
  * explicit size on an extensions-configured cluster exactly as they
  * do on a session-registered one (a diverging copy here once silently
  * dropped the third argument).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { f =>
      ext.injectFunction((
        FunctionIdentifier(f.name),
        new ExpressionInfo("graft", f.name),
        f.builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.CosineSignToDot)
  }
}
