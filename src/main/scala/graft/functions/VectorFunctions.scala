package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Backed by the native codegen kernels in `graft.plans.expr` (registered
  * as `graft_dot` / `graft_norm` by `GraftExtensions`): Spark's
  * `aggregate`/`zip_with` higher-order functions are `CodegenFallback` —
  * interpreted, allocation-per-element — so pairwise cosine in a join hot
  * path must be a real generated loop. The kernels fold left-to-right in
  * double exactly like the column-function rendering they replaced, so
  * results stay bit-stable for oracle hashing.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = call_function("graft_norm", a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for cross-engine hash stability. */
  def cosineR(a: Column, b: Column, scale: Int = 6): Column = round(cosine(a, b), scale)

  /** Cosine from pre-computed norms — use in pairwise joins so each
    * vector's norm is computed once per VECTOR (its own projection), not
    * once per PAIR. Produces bit-identical doubles to `cosineR` (same
    * norm kernel, same fold order).
    */
  def cosineRFromNorms(a: Column, b: Column, normA: Column, normB: Column,
                       scale: Int = 6): Column =
    round(dot(a, b) / (normA * normB), scale)
}
