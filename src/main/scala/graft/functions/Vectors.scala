package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) via the
  * Column API — no UDFs, no string interpolation of column expressions,
  * works on qualified/aliased columns. Shared by Dedup, Similarity and
  * the UDF surface (graft.functions.Udfs keeps the UDF twin for the
  * declared extensibility story; these are the hot-path versions).
  */
object Vectors {

  /** Σ xᵢ·yᵢ — left-to-right double fold, matching DuckDB's
    * list_dot_product after rounding. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  /** ‖x‖₂ */
  def norm(x: Column): Column =
    sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))

  /** cos(x, y) rounded to 6 decimals (rounding absorbs the
    * engine-specific last bit of the float fold). */
  def cosine(x: Column, y: Column): Column =
    round(dot(x, y) / (norm(x) * norm(y)), 6)

  /** cos(x, y) with pre-computed norms. In any pairwise query the
    * norms should be computed once per VECTOR (n HOF folds) and
    * carried through the join, not once per PAIR (3n² folds) — same
    * double ops in the same order as `cosine`, so results are
    * bit-identical. */
  def cosinePre(x: Column, y: Column, nx: Column, ny: Column): Column =
    round(dot(x, y) / (nx * ny), 6)
}
