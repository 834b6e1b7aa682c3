package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{DotProductExpr, LangScoresExpr, Md5Slice60Expr, MinHashSigExpr, RollingHashExpr, ShingleSetExpr, SimHash16Expr, SimHash64Expr, SpaceSavingAgg, WinnowExpr}

/** SparkSessionExtensions registration: exposes the graft kernel
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   spark.builder.withExtensions(new GraftExtensions)   // or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT minhash_sig(shingle_set(split(text, ' '), 3), 8) FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other              => throw new IllegalArgumentException(s"$fn: literal int expected, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "shingle_set",
      new ExpressionInfo(classOf[ShingleSetExpr].getName, "shingle_set"),
      (args: Seq[Expression]) => ShingleSetExpr(args.head, intArg(args(1), "shingle_set"))
    ),
    (
      "minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head, intArg(args(1), "minhash_sig"))
    ),
    (
      "simhash16",
      new ExpressionInfo(classOf[SimHash16Expr].getName, "simhash16"),
      (args: Seq[Expression]) => SimHash16Expr(args.head)
    ),
    (
      "simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)
    ),
    (
      "md5_slice60",
      new ExpressionInfo(classOf[Md5Slice60Expr].getName, "md5_slice60"),
      (args: Seq[Expression]) => Md5Slice60Expr(args.head, intArg(args(1), "md5_slice60"))
    ),
    (
      "winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowExpr].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) =>
        WinnowExpr(args.head, intArg(args(1), "winnow_fingerprints"), intArg(args(2), "winnow_fingerprints"))
    ),
    (
      "lang_scores",
      new ExpressionInfo(classOf[LangScoresExpr].getName, "lang_scores"),
      (args: Seq[Expression]) => LangScoresExpr(args.head)
    ),
    (
      "rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHashExpr(args.head)
    ),
    (
      "dot_product",
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))
    ),
    (
      "space_saving_topk",
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "space_saving_topk"),
      (args: Seq[Expression]) =>
        SpaceSavingAgg(args.head, intArg(args(1), "space_saving_topk"), intArg(args(2), "space_saving_topk"))
    )
  )

  /** Register into an already-running session (tests, driver sessions
    * created without the extensions conf).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
