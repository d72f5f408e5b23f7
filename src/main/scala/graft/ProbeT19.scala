package graft

import org.apache.spark.sql.SparkSession

object ProbeT19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.newSession("32")
    val fn = SparkEntry.queries("t19_classifier_train")
    fn(spark, sfDir).count() // warm
    // now inspect the x view: is it cached, and is a count over it fast?
    for (i <- 1 to 3) {
      val x = spark.table("t19_x")
      val t0 = System.nanoTime()
      val n = x.count()
      println(f"[probe$i] t19_x level=${x.storageLevel} rows=$n count=${(System.nanoTime()-t0)/1e9}%.3f s")
      val t1 = System.nanoTime()
      spark.sql("SELECT bucket FROM t19_x GROUP BY bucket").localCheckpoint().count()
      println(f"[probe$i] w0-style checkpoint=${(System.nanoTime()-t1)/1e9}%.3f s")
      val t2 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[probe$i] full t19=${(System.nanoTime()-t2)/1e9}%.3f s")
    }
    spark.stop()
  }
}
