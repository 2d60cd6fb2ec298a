package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot matches the interpreted higher-order formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sf0001)
    val both = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(2000)
      .select(
        VectorOps.dot($"a.embedding", $"b.embedding").as("fast"),
        VectorOps.dotHof($"a.embedding", $"b.embedding").as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0)
  }

  test("VecDot participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf0001)
    val plan = e.select(VectorOps.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, plan.toString.take(500))
  }

  test("VecDot handles double arrays and null rows") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0))),
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot($"a", $"b").as("d")).collect()
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).isNullAt(0))
  }

  test("VecDot rejects non-array inputs with a clear error") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(VectorOps.dot($"a", $"b")).collect()
    }
    assert(err.getMessage.contains("vec_dot") || err.getMessage.contains("DATATYPE"),
      err.getMessage)
  }
}
