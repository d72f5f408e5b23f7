package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2: one entry per
  * implemented operator, each with (when SQL-expressible) a DuckDB oracle
  * in `oracleSql` that the driver hash-matches at sf0.01.
  */
object SparkEntry {

  private def inventory: Seq[Q] = CoreQueries.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Routes lineitem through the columnfile format (write + scan) and
    * aggregates — the full engine path end to end.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.registerCF(spark, dir, Seq("lineitem"))
    spark.sql(
      """SELECT l_returnflag AS rflag, COUNT(*) AS cnt,
        |  SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_c
        |FROM cf_lineitem GROUP BY l_returnflag""".stripMargin)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
