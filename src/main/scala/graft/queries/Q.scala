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

  /** Shared oracle for the per-customer top-3 orders — q7 (window
    * formulation) and q39 (bounded top-k aggregate) implement the SAME
    * semantics; one oracle string encodes that.
    */
  val topOrdersOracle: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders) t
    WHERE rk <= 3
  """
}
