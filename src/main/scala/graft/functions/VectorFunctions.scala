package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure
  * codegen-friendly column expressions (`zip_with`/`aggregate` — no UDFs,
  * no driver-side loops; the fold stays inside whole-stage codegen).
  *
  * All accumulation is in double, left-to-right, so results are bit-stable
  * and reproducible across engines for oracle hashing.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for cross-engine hash stability. */
  def cosineR(a: Column, b: Column, scale: Int = 6): Column = round(cosine(a, b), scale)

  /** Cosine from pre-computed norms — use in pairwise joins so each
    * vector's norm is computed once per VECTOR (its own projection), not
    * once per PAIR. Produces bit-identical doubles to `cosineR` (same
    * norm expression, same fold order).
    */
  def cosineRFromNorms(a: Column, b: Column, normA: Column, normB: Column,
                       scale: Int = 6): Column =
    round(dot(a, b) / (normA * normB), scale)
}
