package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVecDot, FloatVecNorm, SimHash60}

/** SparkSessionExtensions registering the engine's custom Catalyst
  * pieces for any session configured with them: expressions as SQL
  * functions (`spark.sql("SELECT vec_dot(a, b) ...")`), the GroupTopK
  * planner strategy, and the IntervalHistogram rewrite rule:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (The DataFrame-level APIs in graft.plans also self-inject via
  * ExperimentalMethods, so they work without session configuration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.IntervalHistogramRule)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float array"),
      (args: Seq[Expression]) => FloatVecNorm(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit SimHash of a tokenized string"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(words, n, k) - k-function MinHash signature of the n-gram shingles"),
      (args: Seq[Expression]) => graft.functions.MinHashSig(args(0),
        args(1).eval().asInstanceOf[Number].intValue,
        args(2).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_set"),
      info("shingle_set",
        "shingle_set(words, n) - sorted distinct n-gram shingle hashes"),
      (args: Seq[Expression]) => graft.functions.ShingleHashSet(args(0),
        args(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |A∩B| of two sorted long-array sets"),
      (args: Seq[Expression]) =>
        graft.functions.SortedIntersectSize(args(0), args(1))))
  }
}
