// HISTORICAL PROBE (r17): this survey produced the ~19 % sort-tax
// measurement cited in Q.scala — run against the PRE-strip registry.
// Since Q.stripPresentationSort landed, registered queries carry no
// root Sort, so every query now reports "no root sort" by design; the
// probe is kept as the record of how the number was measured, not as a
// live tool (it also only matches bare Sort roots, not the
// Project-over-Sort shape the registry strip handles).
//
// Sort-tax survey: how much of each query's bench time is the FINAL
// presentation sort (a root-level global Sort whose only purpose is
// deterministic display order)?
//
// The round driver canonicalizes both sides of the oracle compare by
// sorting rows by ALL columns before hashing (tools/check.py mirrors
// it), so a trailing global Sort changes no hash — it is the guide
// §2.4 class "an orderBy used only to make output deterministic".
// This probe A/Bs every selected query: registered plan vs the same
// logical plan with a root Sort(global=true) stripped, timed through
// the same noop sink as the bench. Root-only: a Sort under a Limit
// (top-k) is semantic and is never touched.
//
// sbt "runMain graft.tools.SortTaxProbe <sfDir> <reps> [q1,q2,...]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort

object SortTaxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    def stripRootSort(df: DataFrame): Option[DataFrame] =
      df.queryExecution.logical match {
        case Sort(_, true, child, _) =>
          Some(org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, child))
        case _ => None
      }
    def time(df: => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(ts.length / 2)
    }
    var taxTotal = 0.0
    var withTotal = 0.0
    graft.SparkEntry.all
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
        try {
          val df = q.run(spark, sfDir)
          stripRootSort(df) match {
            case None => println(f"[sorttax] ${q.name}: no root sort")
            case Some(stripped) =>
              // untimed warmups, then interleave-free medians
              df.write.format("noop").mode("overwrite").save()
              stripped.write.format("noop").mode("overwrite").save()
              val tWith = time(q.run(spark, sfDir))
              val tNo = time(org.apache.spark.sql.graft.ColumnBridge.ofRows(
                spark, q.run(spark, sfDir).queryExecution.logical
                  .asInstanceOf[Sort].child))
              taxTotal += (tWith - tNo); withTotal += tWith
              println(f"[sorttax] ${q.name}: with=$tWith%.3f strip=$tNo%.3f " +
                f"tax=${tWith - tNo}%.3f")
          }
        } catch {
          case e: Throwable =>
            println(s"[sorttax] ${q.name}: ERR ${e.getMessage.take(120)}")
        }
      }
    println(f"[sorttax] TOTAL tax=$taxTotal%.2f of with=$withTotal%.2f")
    spark.stop()
  }
}
