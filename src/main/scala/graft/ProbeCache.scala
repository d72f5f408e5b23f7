package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: does a cacheOnce'd relation survive a repeated
  * invocation (new spark.sql text + createOrReplaceTempView of the same
  * name), the pattern every inventory query uses for shared fixtures?
  */
object ProbeCache {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.newSession("32")
    graft.queries.Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT doc_id, w, COUNT(*) AS c FROM (
        |  SELECT doc_id, w FROM documents
        |  LATERAL VIEW explode(split(lower(text), ' ')) _e AS w) t
        |WHERE w <> '' GROUP BY doc_id, w""".stripMargin
    def once(tag: String): Unit = {
      val df = spark.sql(sql)
      val lvl = df.storageLevel
      val t0 = System.nanoTime()
      val cached = if (lvl == org.apache.spark.storage.StorageLevel.NONE) df.cache() else df
      cached.createOrReplaceTempView("probe_x")
      val n = spark.table("probe_x").count()
      val lvlAfterView = spark.sql(sql).storageLevel
      println(f"[$tag] preLevel=$lvl n=$n count=${(System.nanoTime()-t0)/1e9}%.3f s postLevel=$lvlAfterView")
    }
    once("run1"); once("run2"); once("run3")
    // and the view-replacement effect alone:
    val lvlBefore = spark.sql(sql).storageLevel
    spark.sql(sql).createOrReplaceTempView("probe_x")
    val lvlAfter = spark.sql(sql).storageLevel
    println(s"[view-replace] before=$lvlBefore after=$lvlAfter")
    spark.stop()
  }
}
