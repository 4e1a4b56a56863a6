package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native expressions as SQL functions, making
  * the library's fast paths first-class in `spark.sql(...)` text —
  * `SELECT vec_dot(a.embedding, b.embedding)`, `rolling_hash(text)`,
  * `mix_hash32(text)`, `nfc(text)` — exactly as a user of the
  * reference would expect engine functions to be callable from SQL.
  *
  * Two entry points, same registrations:
  *
  *   - config-driven (the cluster-deploy path; works with ANY session
  *     including Connect servers):
  *     `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *   - programmatic, for an existing session:
  *     `GraftExtensions.register(spark)`
  *
  * This is the `SparkSessionExtensions` injection tier of the
  * extension ladder. Whole-operator semantics stay at the composition
  * tier wherever composition already plans to the shape a custom
  * strategy would emit; the ONE exception is the broadcast as-of join
  * ([[BroadcastAsOfJoinPlan]] → [[GraftStrategies]] →
  * [[BroadcastAsOfJoinExec]]), where no composition can avoid
  * shuffling the fact side — see BroadcastAsOf.scala for the
  * argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the one strategy-tier operator (see BroadcastAsOf.scala for why
    // exactly this operator leaves the composition tier)
    ext.injectPlannerStrategy(_ => GraftStrategies)
    // optimizer-rule tier: registered maintained aggregates
    // transparently serve plan-identical queries (MaterializedAggRewrite
    // — the read half of Incremental), and edit-distance filters gain
    // the length-difference short-circuit (LevenshteinPrefilter)
    ext.injectOptimizerRule(_ => MaterializedAggRewrite)
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
  }
}

object GraftExtensions {

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    args.head
  }

  private[graft] val injections: Seq[
      (String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        FloatVecDot(args.head, args(1))
      }),
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(one(args, "rolling_hash"))),
    ("mix_hash32",
      new ExpressionInfo(classOf[MixHash32].getName, "mix_hash32"),
      (args: Seq[Expression]) => MixHash32(RollingHash(one(args, "mix_hash32")))),
    ("nfc",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      (args: Seq[Expression]) => NfcNormalize(one(args, "nfc"))),
    ("ahash64",
      new ExpressionInfo(classOf[AHash64].getName, "ahash64"),
      (args: Seq[Expression]) => AHash64(one(args, "ahash64"))),
    ("multi_count",
      new ExpressionInfo(classOf[MultiPatternCount].getName, "multi_count"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          s"multi_count expects (text, pattern...), got ${args.length} arguments")
        val pats = args.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"multi_count patterns must be string literals, got $other")
        }
        MultiPatternCount(args.head, pats)
      }))

  /** Register the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injections.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
