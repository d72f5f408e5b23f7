package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug harness: print the EXECUTED physical plan of one inventory
  * query under the same session confs as the bench (AQE defaults on).
  *
  *   sbt "Test/runMain graft.tools.PlanProbe q36_cf_join_runtime [sfDir]"
  *
  * The formatted-explain specs assert plan shapes at build time; this
  * exists for interactive diagnosis of warnings that only materialize at
  * execution (e.g. a DPP filter degrading to `dynamicpruningexpression
  * (true)` when broadcast reuse falls through).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println(s"=== EXECUTED PLAN: $name ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
