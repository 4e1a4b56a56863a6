package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works without the Scala API:
  *
  *   - at session build time:
  *     `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *   - on a live session: `GraftFunctions.register(spark)`
  *
  * Both paths share the same builders, so SQL and Column results are
  * identical by construction.
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info(classOf[FloatVecDot], "vec_dot",
        "vec_dot(a, b) - dot product of two array<float> vectors (codegen'd tight loop)"),
      { args =>
        require(args.length == 2, s"vec_dot takes 2 arguments, got ${args.length}")
        FloatVecDot(args(0), args(1))
      }),
    (FunctionIdentifier("rolling_hash"),
      info(classOf[RollingHash], "rolling_hash",
        "rolling_hash(s[, base]) - 64-bit polynomial rolling hash of a string's UTF-8 bytes"),
      {
        case Seq(c)                    => RollingHash(c)
        case Seq(c, b) if b.foldable   =>
          RollingHash(c, b.eval().asInstanceOf[Number].longValue())
        case args                      =>
          throw new IllegalArgumentException(
            s"rolling_hash takes (string[, literal base]), got ${args.length} arguments")
      }),
    (FunctionIdentifier("mixed_hash32"),
      info(classOf[MixHash32], "mixed_hash32",
        "mixed_hash32(s) - uniform 32-bit hash: rolling_hash pushed through a multiplicative avalanche finalizer"),
      { args =>
        require(args.length == 1, s"mixed_hash32 takes 1 argument, got ${args.length}")
        MixHash32(RollingHash(args(0)))
      }),
    (FunctionIdentifier("word_ngrams"),
      info(classOf[WordNGrams], "word_ngrams",
        "word_ngrams(tokens, n) - distinct word n-grams of an array<string>, fused generate+dedup in codegen"),
      {
        case Seq(c, n) if n.foldable =>
          WordNGrams(c, n.eval().asInstanceOf[Number].intValue())
        case args =>
          throw new IllegalArgumentException(
            s"word_ngrams takes (array<string>, literal n), got ${args.length} arguments")
      })
  )

  /** Register every graft function on an already-running session. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, fnInfo, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
