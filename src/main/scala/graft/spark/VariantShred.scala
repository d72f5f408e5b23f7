package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Variant shredding: the q57 nested-leaf pushdown move applied to
  * VARIANT columns (reference: the nested shredding of
  * src/columnfile.h:214-233, where typed leaves are what the scan
  * prunes on — a variant cell is opaque to chunk statistics, its
  * shredded leaf is an ordinary column).
  *
  * Write side: a table is shredded by STORING the extracted path next
  * to the variant as a real typed column whose field METADATA names
  * its provenance (`graft.shredOf` = the variant column, and
  * `graft.shredPath` = the `$.path`); [[VariantShred.shredMeta]]
  * builds it. The schema sidecar serializes field metadata verbatim,
  * so the mapping survives the round trip and reaches the reader's
  * attributes with zero new format surface. By construction the
  * stored leaf equals `variant_get(v, path, type)` row for row — the
  * writer derives it from the same expression.
  *
  * Read side: [[VariantShredRewrite]] (injected as a POST-HOC
  * resolution rule: one pass over the fully-analyzed plan, BEFORE any
  * optimizer batch — in the optimizer, column pruning can interpose a
  * `Project [v]` between an aggregate and the relation and hide the
  * shred attribute from a same-batch rewrite) rewrites
  * `variant_get(v, '$.path', 'type')` — and its `try_` variant — to
  * the shredded attribute wherever one with the exact (column, path,
  * result type) provenance is visible in the same child's output. Everything downstream is ordinary column
  * machinery, for free: the filter reaches the scan as a plain
  * pushed filter (chunk min/max pruning + late materialization), and
  * column pruning drops the variant bytes entirely when no
  * un-shredded path remains — the scan then never reads the variant
  * payload at all.
  *
  * The rewrite is a pure optimization: without the rule (a session
  * that didn't load [[GraftExtensions]]) the same query computes the
  * same result by evaluating variant_get post-scan.
  *
  * Soundness guards (provenance is recorded by column NAME, so the
  * rule must refuse every shape where a name is not proof):
  *   - LINEAGE: a shred substitutes only when it CO-OCCURS with the
  *     referenced variant attribute (by exprId) in one leaf relation
  *     under the child — the true pair always shares its leaf
  *     because shreds are stored next to their variant, while a
  *     cross-join-side pairing (self-joins of shredded tables, or an
  *     orphaned shred whose own variant was projected away joined to
  *     a different table's same-named variant) never does. Exactly
  *     one surviving candidate, else refuse.
  *   - TYPE SAFETY: only timezone-insensitive target types are
  *     rewritten ([[VariantShred.safeTargetType]]) — a timestamp
  *     shred would bake the WRITER's session timezone into reads
  *     running under a different one.
  *   - STRICTNESS: shreds must be derived with strict `variant_get`
  *     (the writer's contract — [[ColumnFileWrite]]'s `shred` option
  *     and every hand-built shred in this repo do). Under that
  *     contract a successful write proves every row casts cleanly,
  *     so rewriting either `variant_get` or `try_variant_get` to the
  *     stored leaf is value-identical.
  */
object VariantShred {
  val ShredOfKey = "graft.shredOf"
  val ShredPathKey = "graft.shredPath"

  /** Field metadata marking a column as the shred of `variantCol` at
    * `path` (e.g. `shredMeta("v", "$.price")`). The stored leaf MUST
    * equal strict `variant_get(variantCol, path, <leaf type>)` row for
    * row — derive it from exactly that expression at write time.
    */
  def shredMeta(variantCol: String, path: String): Metadata =
    new MetadataBuilder()
      .putString(ShredOfKey, variantCol)
      .putString(ShredPathKey, path)
      .build()

  /** Target types the rewrite may substitute: value-complete and
    * timezone-insensitive. Timestamps are excluded — their variant
    * cast consults the session timezone, so a leaf materialized under
    * the writer's zone is not the same function as a read-time
    * `variant_get` under another.
    */
  def safeTargetType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType | BooleanType | StringType | BinaryType => true
      case _: DecimalType => true
      case _ => false
    }
  }
}

object VariantShredRewrite extends Rule[LogicalPlan] {
  import VariantShred._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p if p.resolved && p.children.exists(_.output.exists(a =>
        a.metadata.contains(ShredOfKey))) =>
      p.transformExpressionsUp {
        case vg @ VariantGet(v: AttributeReference,
            Literal(path: UTF8String, StringType), dt, _, _)
            if safeTargetType(dt) =>
          // The provenance key is a NAME, not an exprId, so the name
          // match alone is not proof: a Join is one child, and its
          // output can pair a shred from one side with a same-named
          // variant from the OTHER (self-joins of shredded tables;
          // an orphaned leaf whose own variant was projected away
          // joined to a different table's `v`). Bind by LINEAGE
          // instead: the shred must co-occur with THIS variant
          // attribute (by exprId) in the output of a single leaf
          // relation under the child — shreds are written next to
          // their variant, so the true pair always shares its leaf,
          // while any cross-side pairing never does. Self-joins
          // rewrite correctly (each side's relation copy carries its
          // own exprIds); fire only on exactly one surviving
          // candidate.
          p.children.iterator.flatMap { ch =>
            if (!ch.outputSet.contains(v)) Iterator.empty
            else {
              lazy val leaves = ch.collectLeaves()
              val shreds = ch.output.filter { a =>
                a.metadata.contains(ShredOfKey) &&
                  a.metadata.getString(ShredOfKey) == v.name &&
                  a.metadata.contains(ShredPathKey) &&
                  a.metadata.getString(ShredPathKey) == path.toString &&
                  a.dataType == dt &&
                  leaves.exists(l => l.outputSet.contains(a) &&
                    l.outputSet.contains(v))
              }
              if (shreds.size == 1) shreds.iterator else Iterator.empty
            }
          }.nextOption().getOrElse(vg)
      }
  }
}

/** Session extensions entry point:
  * `.config("spark.sql.extensions", "graft.spark.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPostHocResolutionRule(_ => VariantShredRewrite)
}
