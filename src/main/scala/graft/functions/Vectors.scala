package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using Spark
  * higher-order functions — fully codegen'd, no UDFs, no driver-side
  * work, so every operation scales with partition parallelism.
  *
  * All arithmetic is done in double with strict left-to-right fold
  * order (`aggregate` is a sequential fold), which keeps results
  * deterministic and reproducible across engines.
  */
object Vectors {

  /** Cast array<float> → array<double> (deterministic widening). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product: fold-left sum of element-wise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Dot product for a known dimension, folding over a constant index
    * array instead of materializing zip_with's product array — no per-row
    * allocation, which matters when evaluated O(n²) times. Identical
    * multiply/add order to [[dot]], so bit-identical results. */
  def dotIdx(a: Column, b: Column, dim: Int): Column =
    aggregate(lit((0 until dim).toArray), lit(0.0),
      (acc, i) => acc + element_at(a, i + 1) * element_at(b, i + 1))

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity = dot / (|a| * |b|); inputs should be asDouble. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native dot (custom Catalyst expression `graft_dot`,
    * [[DotProduct]]): identical fold order to [[dot]], but a primitive
    * loop inside whole-stage codegen instead of an interpreted
    * higher-order fold — the kernel for O(n·q)/O(n²) similarity scans.
    * Call [[DotProduct.ensureRegistered]] on the session first. */
  def dotNative(a: Column, b: Column): Column =
    call_function(DotProduct.fnName, a, b)
}
