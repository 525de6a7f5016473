package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Numeric normalization helpers shared by query + oracle construction. */
object Num {

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
