package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for generated code. Catalyst's whole-stage codegen
  * emits plain Java, so each expression below compiles to ONE static call on
  * this object's forwarders — no ScalaUDF wrapper, no serialization of a
  * closure per batch, and the call site stays inside the WholeStageCodegen
  * span (a ScalaUDF by contrast forces encoder round-trips per row).
  */
object ExprRuntime {
  def stem(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.analysis.Porter.stem(s.toString))

  def simhash60(s: UTF8String): Long =
    graft.analysis.Fingerprint.simhash60(s.toString)
}

/** Porter-stem as a native Catalyst expression (C2 at column level): the same
  * frozen Porter 1980 implementation the tokenizer uses (`analysis/Porter`),
  * usable inside any projection without leaving codegen. */
case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireString(prettyName, child)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_stem"
  override protected def nullSafeEval(input: Any): Any =
    ExprRuntime.stem(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.stem($c)")
  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

/** The build-time 60-bit ordered-shingle document fingerprint (C9,
  * `analysis/Fingerprint.simhash60`) as a native expression, so ad-hoc
  * dup-flagging over any text column prices like a hash, not a UDF. */
case class Simhash60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireString(prettyName, child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash60"
  override protected def nullSafeEval(input: Any): Any =
    ExprRuntime.simhash60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash60Expr =
    copy(child = newChild)
}

/** SQL surface for the engine's scalar functions.
  *
  * Two hookups, same registry entries:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the [[GraftExtensions]] class below) makes every new session resolve
  *    them, spark-submit included;
  *  - per-session: `GraftFunctions.register(spark)` for sessions already
  *    constructed (tests, notebooks).
  *
  * `graft_term_hash` is deliberately just Catalyst's XxHash64 at the frozen
  * seed (`core/Hashes.TermHashSeed`, = xxhash64's default 42) — registering
  * the alias pins the engine's term identity as a named SQL function rather
  * than a convention callers must know.
  */
object GraftFunctions {
  import org.apache.spark.sql.functions.call_function

  private[functions] def requireString(name: String, child: Expression): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects a string argument, got ${child.dataType.catalogString}")

  /** Column wrapper: Porter stem (codegen'd, null-safe). */
  def stem(c: Column): Column = withRegistry(call_function("graft_stem", c))

  /** Column wrapper: 60-bit ordered-shingle simhash (codegen'd, null-safe). */
  def simhash60(c: Column): Column = withRegistry(call_function("graft_simhash60", c))

  /** Column wrapper: the engine's frozen 64-bit term hash. */
  def termHash(c: Column): Column = withRegistry(call_function("graft_term_hash", c))

  // call_function resolves lazily at analysis, so wrappers only need the
  // ACTIVE session registered; do it idempotently on first touch per session.
  private def withRegistry(c: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    c
  }

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def one(name: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly one argument, got ${args.length}")
  }

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_stem"),
      info("graft_stem", "graft_stem(str) - Porter-stems a single lowercase word."),
      one("graft_stem")(PorterStemExpr)),
    (FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60",
        "graft_simhash60(str) - 60-bit ordered-shingle document fingerprint."),
      one("graft_simhash60")(Simhash60Expr)),
    (FunctionIdentifier("graft_term_hash"),
      info("graft_term_hash",
        "graft_term_hash(str) - the engine's frozen 64-bit term hash (xxh64 seed 42)."),
      one("graft_term_hash")(e => new XxHash64(Seq(e)))))

  /** Idempotent per-session registration (createOrReplaceTempFunction
    * semantics via registerFunction: same builder every time). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point (SparkSessionExtensions contract:
  * a `Unit`-returning function of the extensions holder with a no-arg
  * constructor). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
