package graft.operators

/** Helper-column hygiene shared by the join operators: they inject
  * `__`-prefixed working columns with `withColumn`/`select`, and Spark's
  * `withColumn` silently REPLACES an existing column of the same name —
  * a user column called `__bin` would be overwritten and then projected
  * back out under the user's name with the operator's internal values.
  * Fail fast instead.
  */
private[operators] object Reserved {
  private val names = Set(
    "__t", "__tag", "__lrow", "__pay", "__carried", // AsOfJoin
    "__bin", "__lb0", "__rb0",                      // RangeJoin
    "__salt")                                       // SaltedJoin

  def check(op: String, columns: Seq[String]): Unit = {
    val clash = columns.filter(names.contains).distinct
    require(clash.isEmpty,
      s"$op: input columns ${clash.mkString(", ")} collide with the " +
        "operator's reserved working columns (rename them first)")
  }
}
