package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One inventory entry: a Spark query plus (when SQL-expressible) the
  * equivalent DuckDB oracle run by the driver's correctness gate.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {

  /** Query whose Spark text and DuckDB oracle are the same SQL, run over
    * the standard parquet-backed views.
    */
  def shared(name: String, sql: String): Q =
    Q(name, (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }, Some(sql))

  /** Query whose Spark side runs over columnfile-backed `cf_<table>`
    * views (exercising our format's scan path) while the oracle runs the
    * same logic over the plain parquet tables.
    */
  def viaCF(name: String, tables: Seq[String], sparkSql: String,
            oracleSql: String, compression: String = "lz4"): Q =
    Q(name, (spark, dir) => {
      Tables.registerCF(spark, dir, tables, compression)
      spark.sql(sparkSql)
    }, Some(oracleSql))

  /** Query with distinct Spark and oracle SQL texts (dialect divergence). */
  def dialect(name: String, sparkSql: String, oracleSql: String): Q =
    Q(name, (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql(sparkSql)
    }, Some(oracleSql))

  /** Non-SQL-expressible operator: driver records a rows-only check. */
  def rowsOnly(name: String, run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
