package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{IntegerType, LongType}

/** IntervalHistogram as a declarative logical operator + rewrite rule —
  * the SURVEY.md §7.2 tier-(c) path for the one genuinely non-standard
  * hillview semantic (an interval contributes a count to EVERY bucket it
  * overlaps, reference GroupBySketch.java:63-76).
  *
  * `IntervalHistogramNode` is a custom LogicalPlan users can place in a
  * query; `IntervalHistogramRule` (a `Rule[LogicalPlan]`, registered via
  * `GraftExtensions.injectOptimizerRule` or injected at call time) then
  * rewrites it into ordinary relational algebra — project the overlapped
  * bucket array, explode, partial/final count aggregate — so Catalyst
  * plans, prunes and codegens the result like any native aggregation.
  * The rewrite projects ONLY the bucket-array expression before the
  * explode, so the parquet scan reads just the two endpoint columns.
  *
  * Complements GroupTopK (LogicalPlan + SparkStrategy + physical
  * operators): together they exercise both extension paths — rewrite-to-
  * builtins and custom physical execution.
  */
case class IntervalHistogramNode(
    lo: Expression,
    hi: Expression,
    min: Double,
    max: Double,
    n: Int,
    bucketAttr: Attribute,
    cntAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = Seq(bucketAttr, cntAttr)
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object IntervalHistogramRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.graftshim.{columnToExpr, exprToColumn}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case IntervalHistogramNode(lo, hi, mn, mx, n, bucketAttr, cntAttr, child) =>
      // Reuse the Column-level interval semantics (normalization, missing
      // handling, overlap clamp) so the rewrite and the combinator API
      // can never drift apart. The combinator runs on the child plan and
      // goes through the ANALYZER (Column trees use getField / typed-null
      // coercion, which are analyzer-dependent — hand-built copies left
      // the plan unresolved mid-optimization); the analyzed replacement
      // is then aliased back to this node's output attribute ids so
      // references above the node stay valid.
      val spark = org.apache.spark.sql.SparkSession.active
      // Project the two endpoint attributes FIRST: this rule runs after
      // the optimizer's column-pruning batch, so the replacement must
      // arrive pre-pruned for the scan to read only the endpoints.
      val childDf = graftshim.ofRows(spark, child)
        .select(graftshim.exprToColumn(lo), graftshim.exprToColumn(hi))
      val iv = graft.operators.Intervals.make(
        graftshim.exprToColumn(lo), graftshim.exprToColumn(hi))
      val rewritten = graftshim.analyzedPlan(
        graft.operators.Intervals.histogram(childDf, iv, mn, mx, n))
      Project(Seq(
        Alias(rewritten.output(0), bucketAttr.name)(exprId = bucketAttr.exprId),
        Alias(rewritten.output(1), cntAttr.name)(exprId = cntAttr.exprId)),
        rewritten)
  }
}

object IntervalHistogram {
  import org.apache.spark.sql.graftshim

  /** Interval histogram through the custom logical operator: endpoints
    * from two (possibly unordered) numeric columns of `df`; output
    * (bucket, cnt), one count per overlapped bucket per row.
    */
  def histogram(df: DataFrame, loCol: String, hiCol: String,
      min: Double, max: Double, n: Int): DataFrame = {
    val spark = df.sparkSession
    val exp = graftshim.experimentalStrategies(spark)
    if (!exp.extraOptimizations.contains(IntervalHistogramRule))
      exp.extraOptimizations = exp.extraOptimizations :+ IntervalHistogramRule
    val plan = graftshim.analyzedPlan(df)
    def resolve(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val bucketAttr = AttributeReference("bucket", IntegerType, nullable = true)()
    val cntAttr = AttributeReference("cnt", LongType, nullable = false)()
    graftshim.ofRows(spark,
      IntervalHistogramNode(resolve(loCol), resolve(hiCol), min, max, n,
        bucketAttr, cntAttr, plan))
  }
}
