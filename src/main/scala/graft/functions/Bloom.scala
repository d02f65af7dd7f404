package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** User-facing registration of Spark's Bloom-filter expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its own runtime-filter rewrite (`InjectRuntimeFilter`, plan-proven in
  * `RuntimeFilterSpec`) but does not register them as SQL functions, so
  * a pipeline cannot build a Bloom filter as DATA — e.g. sketch a
  * benchmark suite's n-grams once and probe a 100 TB corpus against the
  * broadcast sketch (`decontaminate_bloom`). These shims expose the
  * existing, codegen'd expressions under `graft_bloom_agg` /
  * `graft_might_contain` via the same SparkSessionExtensions route as
  * [[DotProduct]] — registration only, no re-implementation.
  */
object Bloom {
  val aggName = "graft_bloom_agg"
  val probeName = "graft_might_contain"

  private val aggInfo =
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, aggName)
  private val probeInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, probeName)

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(c) => new BloomFilterAggregate(c)
    case Seq(c, n) => new BloomFilterAggregate(c, n)
    case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
    case other => throw new IllegalArgumentException(
      s"$aggName expects 1-3 arguments, got ${other.size}")
  }

  private val probeBuilder: Seq[Expression] => Expression = {
    case Seq(bf, v) => BloomFilterMightContain(bf, v)
    case other => throw new IllegalArgumentException(
      s"$probeName expects 2 arguments, got ${other.size}")
  }

  /** Injection point for `spark.sql.extensions`. */
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(aggName), aggInfo, aggBuilder))
    ext.injectFunction((FunctionIdentifier(probeName), probeInfo, probeBuilder))
  }

  /** Imperative, idempotent registration for harness-owned sessions. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val aggId = FunctionIdentifier(aggName)
    if (!reg.functionExists(aggId)) reg.registerFunction(aggId, aggInfo, aggBuilder)
    val probeId = FunctionIdentifier(probeName)
    if (!reg.functionExists(probeId))
      reg.registerFunction(probeId, probeInfo, probeBuilder)
  }
}
