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
}
