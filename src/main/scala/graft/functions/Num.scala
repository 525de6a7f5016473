package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric normalization helpers shared by query + oracle construction. */
object Num {

  /** Canonical fixed-scale string for a DECIMAL(p,8) column, matching
    * DuckDB's `CAST(dec AS VARCHAR)` layout ("0.00000000", "-3.25000000").
    *
    * Spark's own decimal→string cast is `BigDecimal.toString`, which flips
    * to scientific notation for zero ("0E-8") and magnitudes below 1e-6
    * ("1.2E-7") — so the cross-engine decimal surface (c1/c2) builds the
    * string from exact decimal arithmetic instead: integer part and the
    * 8-digit fraction are derived separately (both exact in decimal space),
    * so no double rounding and no notation drift on either engine.
    */
  def decStr8(d: Column): Column = {
    val a = abs(d)
    val ip = floor(a).cast("decimal(30,0)")
    concat(
      when(d < 0, lit("-")).otherwise(lit("")),
      ip.cast("string"),
      lit("."),
      lpad(((a - ip) * lit(100000000L)).cast("long").cast("string"), 8, "0"))
  }

  /** Normalize IEEE-754 negative zero to +0.0: `x + 0.0` maps -0.0 → +0.0
    * and is the identity for every other double (including NaN and ±Inf).
    *
    * Needed wherever a rounded column can land on exact zero: Spark's
    * `round` goes through BigDecimal (no signed zero, so a tiny negative
    * like `sin(π·k) ≈ -2.4e-16` rounds to +0.0) while DuckDB rounds in
    * double space (keeping the sign → -0.0). The two compare equal
    * numerically but hash differently byte-wise, and the driver gate hashes
    * bytes — so BOTH sides normalize: Spark via this helper, the oracle SQL
    * via a matching `+ 0.0`.
    */
  def nz(c: Column): Column = c + lit(0.0)
}
