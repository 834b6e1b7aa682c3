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

  /** Builder with an arity gate: a wrong-arity SQL call gets a clear
    * "requires N arguments" error instead of a raw
    * IndexOutOfBoundsException from args(i).
    */
  private def fn(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression
  ): (String, ExpressionInfo, Seq[Expression] => Expression) =
    (
      name,
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        if (args.length != arity)
          throw new IllegalArgumentException(
            s"$name requires $arity argument(s), got ${args.length}")
        build(args)
      }
    )

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("shingle_set", classOf[ShingleSetExpr], 2)(a => ShingleSetExpr(a.head, intArg(a(1), "shingle_set"))),
    fn("minhash_sig", classOf[MinHashSigExpr], 2)(a => MinHashSigExpr(a.head, intArg(a(1), "minhash_sig"))),
    fn("simhash16", classOf[SimHash16Expr], 1)(a => SimHash16Expr(a.head)),
    fn("simhash64", classOf[SimHash64Expr], 1)(a => SimHash64Expr(a.head)),
    fn("md5_slice60", classOf[Md5Slice60Expr], 2)(a => Md5Slice60Expr(a.head, intArg(a(1), "md5_slice60"))),
    fn("winnow_fingerprints", classOf[WinnowExpr], 3)(a =>
      WinnowExpr(a.head, intArg(a(1), "winnow_fingerprints"), intArg(a(2), "winnow_fingerprints"))),
    fn("lang_scores", classOf[LangScoresExpr], 1)(a => LangScoresExpr(a.head)),
    fn("rolling_hash", classOf[RollingHashExpr], 1)(a => RollingHashExpr(a.head)),
    fn("dot_product", classOf[DotProductExpr], 2)(a => DotProductExpr(a.head, a(1))),
    fn("space_saving_topk", classOf[SpaceSavingAgg], 3)(a =>
      SpaceSavingAgg(a.head, intArg(a(1), "space_saving_topk"), intArg(a(2), "space_saving_topk")))
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
