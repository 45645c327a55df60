package graft

import org.apache.spark.sql.functions._

import graft.plans.CosineSignToDot

class RulesSpec extends SparkSuite {
  import spark.implicits._

  test("CosineSignToDot rewrites the sound direction only, semantics preserved") {
    GraftFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(CosineSignToDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosineSignToDot
    // plan assertions on a parquet relation (a LocalRelation would be
    // fully constant-folded by ConvertToLocalRelation)
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val ltPlan = e.where(expr("cosine_sim(a, b) < 0"))
      .queryExecution.optimizedPlan.toString
    assert(ltPlan.contains("dot_f32"), s"rule did not fire:\n$ltPlan")
    assert(!ltPlan.contains("cosine_sim"))
    // `> 0` must NOT be rewritten: Spark orders NaN largest, so a
    // zero vector gives cos NaN > 0 = true but dot 0.0 > 0 = false
    val gtPlan = e.where(expr("cosine_sim(a, b) > 0"))
      .queryExecution.optimizedPlan.toString
    assert(gtPlan.contains("cosine_sim") && !gtPlan.contains("dot_f32"))

    // semantics on edge data, both predicates
    val df = Seq(
      (1L, Array(1f, 1f), Array(1f, 2f)),    // cos > 0
      (2L, Array(1f, 0f), Array(-1f, 0f)),   // cos < 0
      (3L, Array(0f, 0f), Array(1f, 2f)),    // zero vec: cos NaN, dot 0
      (4L, Array(1f, 2f), Array(1f, 2f, 3f)), // mismatch: NaN both
      // Inf elements: dot = -Inf / +Inf / NaN while cos is NaN in all
      // three — the divergence the rule's dot != -Inf conjunct exists
      // for (an unguarded `dot < 0` rewrite would KEEP id 5)
      (5L, Array(Float.PositiveInfinity, 1f), Array(-1f, 1f)), // dot -Inf
      (6L, Array(Float.PositiveInfinity, 1f), Array(1f, 1f)),  // dot +Inf
      (7L, Array(Float.PositiveInfinity, 1f), Array(0f, 1f))   // dot NaN
    ).toDF("id", "a", "b")
    val lt = df.where(expr("cosine_sim(a, b) < 0"))
      .select("id").as[Long].collect().toSeq
    assert(lt == Seq(2L)) // NaN rows false under < in both forms
    val gt = df.where(expr("cosine_sim(a, b) > 0"))
      .select("id").as[Long].collect().toSeq
    // Spark NaN-largest: every NaN-cos row is > 0, including the Infs
    assert(gt == Seq(1L, 3L, 4L, 5L, 6L, 7L))
  }
}
