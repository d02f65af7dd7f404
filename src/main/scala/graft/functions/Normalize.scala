package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization
  * (NFC/NFD/NFKC/NFKD) — `graft_normalize(str, 'NFC')`.
  *
  * Why it exists: text normalization is the FIRST step of every
  * LLM-corpus pipeline (dedup keys, fingerprints and token counts all
  * change if "é" is sometimes one codepoint and sometimes e+combining
  * mark), and Spark has no builtin for it — the alternatives are a
  * Scala UDF (serialization boundary, no codegen, the banned tier) or
  * shipping text to Python. This is SURVEY §7.3 tier (b): a custom
  * expression participating in whole-stage codegen, one static
  * `java.text.Normalizer` call per row, null-safe, no allocation
  * beyond the result.
  *
  * The normalization form is bound at PLAN time from a literal second
  * argument (like Spark's own `conv`/`format_string` pattern): a
  * non-literal form would make per-row behavior data-dependent, which
  * no caller needs and which would defeat constant-folding.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val javaForm = java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        if (UnicodeNormalize.Forms(form)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of NFC|NFD|NFKC|NFKD, got '$form'")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = UnicodeNormalize.fnName

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, javaForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val formRef = ctx.addReferenceObj("form", javaForm,
        classOf[java.text.Normalizer.Form].getName)
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), $formRef));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val fnName = "graft_normalize"

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private val info = new ExpressionInfo(classOf[UnicodeNormalize].getName, fnName)

  private val builder: Seq[Expression] => Expression = {
    case Seq(e, Literal(f, _: StringType)) =>
      UnicodeNormalize(e, String.valueOf(f).toUpperCase(java.util.Locale.ROOT))
    case Seq(_, other) => throw new IllegalArgumentException(
      s"$fnName form argument must be a string literal, got $other")
    case other => throw new IllegalArgumentException(
      s"$fnName expects (string, form) arguments, got ${other.size}")
  }

  /** Injection point for `spark.sql.extensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier(fnName), info, builder))

  /** Imperative registration for sessions not built through
    * [[graft.Session]] (e.g. a harness-owned session): idempotent. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
  }
}
