package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{MinHashSig, ShingleHash64, SimHash64, VecDot}

/** SparkSessionExtensions registration: exposes the graft custom
  * expressions to SQL (`SELECT vec_dot(a.embedding, b.embedding) ...`).
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the standard deployment
  * shape for a cluster-wide install where users only speak SQL.
  */
object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((args: Seq[Expression]) => VecDot(args(0), args(1))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64(args.head)),
    "shingle_hash64" -> ((args: Seq[Expression]) => ShingleHash64(args.head, 3, distinct = true)),
    "minhash_sig" -> ((args: Seq[Expression]) => MinHashSig(args.head, 8, 3)))

  /** Install into an ALREADY-RUNNING session (notebooks, shared test
    * sessions). The withExtensions path below only binds at session
    * construction — getOrCreate on an existing session ignores it. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.LevenshteinPrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinPrefilter
    if (!spark.experimental.extraStrategies.contains(
        graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
