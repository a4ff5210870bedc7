package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive `term_bucket` partition predicates from `term`
  * predicates.
  *
  * Every graft index table that carries a `term` column also carries
  * `term_bucket = pmod(md5_60(term), 64)` as its PARTITION column — an
  * invariant enforced at every write ([[graft.index.SearchIndex]]
  * build/update/delete/compact all bucket through the same expression).
  * The engine's own query paths exploit it by computing bucket lists
  * driver-side, but a user querying the postings relation directly
  * (`WHERE term = 'spark'`) gets a full scan of all 64 bucket dirs:
  * Catalyst cannot know that `term_bucket` is a function of `term`.
  *
  * This rule teaches it. For a `Filter` whose child exposes both
  * columns, any top-level-conjunct equality/IN predicate on `term`
  * yields the matching `term_bucket IN (buckets)` conjunct, computed
  * with the same md5 the writers use. The added predicate reaches
  * `FileSourceStrategy` as a partition filter, so the scan reads only
  * the matching bucket dirs — on a 100 TB index that is the difference
  * between touching 1/64th of the files and touching all of them.
  *
  * Soundness: rows where `term` matches necessarily have a matching
  * bucket (the invariant), so conjoining the bucket predicate never
  * drops a qualifying row; it only lets the scan skip directories that
  * cannot contain one. The rule fires once per Filter — a condition
  * that already references `term_bucket` (including its own output) is
  * left untouched, so the optimizer's fixed-point loop terminates.
  *
  * Activation: `spark.sql.extensions=...GraftExtensions` (injected as
  * an optimizer rule) or [[GraftFunctions.register]] on a live session.
  */
object InferTermBucketFilter extends Rule[LogicalPlan] {

  /** String literals constrained onto `term` by a top-level conjunct of
    * `cond` (below Or/Not a match would be unsound — a disjunct does
    * not constrain the whole row set). */
  private def termsOf(cond: Expression, term: Attribute): Seq[String] =
    cond match {
      case And(l, r) => termsOf(l, term) ++ termsOf(r, term)
      case EqualTo(a: Attribute, Literal(v: UTF8String, StringType))
          if a.semanticEquals(term) => Seq(v.toString)
      case EqualTo(Literal(v: UTF8String, StringType), a: Attribute)
          if a.semanticEquals(term) => Seq(v.toString)
      case In(a: Attribute, vs)
          if a.semanticEquals(term) && vs.nonEmpty && vs.forall {
            case Literal(_: UTF8String, StringType) => true
            case _ => false
          } =>
        vs.map { case Literal(v: UTF8String, StringType) => v.toString }
      case InSet(a: Attribute, set)
          if a.semanticEquals(term) && set.nonEmpty &&
            set.forall(_.isInstanceOf[UTF8String]) =>
        set.toSeq.map(_.asInstanceOf[UTF8String].toString)
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val termAttr = child.output.find(a =>
        a.name.equalsIgnoreCase("term") && a.dataType == StringType)
      val bucketAttr = child.output.find(a =>
        a.name.equalsIgnoreCase("term_bucket") && a.dataType == IntegerType)
      (termAttr, bucketAttr) match {
        case (Some(t), Some(b)) if !cond.references.contains(b) =>
          val terms = termsOf(cond, t)
          if (terms.isEmpty) f
          else {
            val buckets = terms.map(graft.index.SearchIndex.termBucketOf)
              .distinct.sorted
            Filter(And(cond,
              In(b, buckets.map(Literal(_, IntegerType)))), child)
          }
        case _ => f
      }
  }
}
