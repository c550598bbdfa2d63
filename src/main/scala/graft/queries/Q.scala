package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared cross-engine-deterministic building blocks (see README
  * "determinism rules"). Single definitions so a fix in one surface
  * can't silently desynchronize another.
  */
object Q {

  /** Exact decimal sum of a money expression, surfaced as double —
    * order-independent and schema-stable across engines. A product of k
    * two-decimal factors needs scale 2k to stay exact.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * used by q21 (per-doc fingerprint) and q22 (exact dedup).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " ").cast("binary"))

  /** DuckDB restatement of [[fingerprint]]. */
  val fingerprintDuck: String =
    """md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))"""
}
