package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * Spark's higher-order functions (zip_with / aggregate / transform) —
  * codegen'd, no UDF, no serialization off the Tungsten rows.
  *
  * All arithmetic is double-precision after an explicit element cast, so
  * results don't depend on whether the source column was float or double.
  */
object VectorOps {

  /** Element-wise cast to double. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product — a codegen'd Catalyst expression
    * ([[graft.expressions.VecDot]]); same sequential fold order as the
    * higher-order-function formulation but ~100× faster per pair, which
    * is what makes all-pairs similarity feasible at bench scale. */
  def dot(a: Column, b: Column): Column = graft.expressions.VecDot(a, b)

  /** Interpreted reference implementation (used in tests to pin VecDot's
    * semantics to the composable form). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0d), _ + _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to `scale` decimals. Rounding makes the
    * value portable across engines/fold orders (differences live at the
    * 1e-15 level; 6 decimals is far above it). */
  def cosine(a: Column, b: Column, scale: Int = 6): Column =
    round(dot(a, b) / (norm(a) * norm(b)), scale)

  /** Random-hyperplane LSH signature: `planes` sign-vectors are derived
    * deterministically from xxhash64(plane, dim), so every executor (and
    * every run) builds the same planes with zero driver-side state to
    * broadcast. Bit p = 1 iff sum_j v_j * sign(p, j) > 0. */
  def hyperplaneSignature(v: Column, planes: Int): Column =
    hyperplaneSig(v, planes, (p, j) =>
      when(pmod(xxhash64(lit(p), j), lit(2)) === 0, 1.0d).otherwise(-1.0d))

  /** Portable twin of [[hyperplaneSignature]]: the sign of plane p at dim
    * j is the parity of the first md5 hex nibble of "p|j" — identically
    * computable in ANSI SQL/DuckDB, which is what gives q39 a full
    * value-hash oracle. The float fold order matters for the sign test at
    * the last ulp: both Spark's `aggregate` and DuckDB's `list_sum` are
    * strict sequential left folds (verified bit-exact over every
    * (vector, plane) pair in the test corpus). xxhash64 planes stay the
    * production default (no md5 per (dim, plane) on the hot path). */
  def hyperplaneSignatureMd5(v: Column, planes: Int): Column =
    hyperplaneSig(v, planes, (p, j) =>
      when(conv(substring(md5(concat(lit(s"$p|"), j.cast("string"))), 1, 1), 16, 10)
            .cast("int") % 2 === 0, 1.0d)
        .otherwise(-1.0d))

  private def hyperplaneSig(
      v: Column, planes: Int, sign: (Int, Column) => Column): Column = {
    val dv = asDouble(v)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(dv, transform(sequence(lit(0), size(v) - 1), j => sign(p, j)),
          _ * _),
        lit(0.0d), _ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
