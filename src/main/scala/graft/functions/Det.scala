package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every oracle-checked query. */
object Det {

  /** Round a double column exactly the way DuckDB's ROUND(DOUBLE, n) does.
    *
    * DuckDB computes `std::round(x * 10^n) / 10^n` (half away from zero on
    * the *scaled binary double*), while Spark's `round(col, n)` rounds the
    * shortest-decimal-string view of the unscaled double (HALF_UP via
    * BigDecimal). The two disagree on values like 1222.745 whose scaled
    * double lands just below the .5 boundary. Emulating the scaled form
    * makes Spark bit-identical to the oracle: `round(y, 0)` on a double
    * equals `std::round(y)` for every double (X.5 is exactly representable,
    * so the shortest repr of y is on the same side of the boundary as y).
    */
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    // + 0.0 folds IEEE negative zero into +0.0; DuckDB's std::round
    // produces -0.0 for tiny negatives while BigDecimal never does, so
    // oracle SQL pairs any round() that can yield -0.0 with "+ 0".
    round(c * lit(p), 0) / lit(p) + lit(0.0)
  }

  /** Deterministic uniform bucket: the first `hexDigits` hex chars of
    * md5(key) as a non-negative long — the engine's standard replacement
    * for `rand()` wherever a sampling/splitting decision must be a pure
    * function of the data (reproducible under any partitioning, executor
    * count, or retry) AND replicable by the DuckDB oracle:
    *
    * {{{ CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, N)) AS BIGINT) }}}
    *
    * Used by the hash split (q64), source mixing (q94), cluster split
    * (q95) and weighted sampling (q96); callers apply their own modulus
    * or scale. Max 15 hex digits (long range). */
  def md5Bucket(key: Column, hexDigits: Int): Column = {
    require(hexDigits > 0 && hexDigits <= 15, s"hexDigits: $hexDigits")
    conv(substring(md5(key.cast("string")), 1, hexDigits), 16, 10)
      .cast("long")
  }
}
