package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact fixed-point money arithmetic shared by the relational
  * queries (RelOps, TpchOps, StorageOps).
  *
  * Why this exists: `round(sum(<double>), 2)` is not engine-stable.
  * Two distinct failure classes were observed or latent against the
  * DuckDB oracle:
  *
  *   1. Association: double addition is order-sensitive, and Spark's
  *      shuffle order differs from DuckDB's scan order, so the raw
  *      sums differ in the last ulps — enough to straddle a half-cent
  *      (the q9 failure seen at sf0.001 in round 1).
  *   2. Shortest-repr rounding: even with an EXACT sum arrived at by
  *      fixed-point arithmetic, `round(x, 2)` diverges at a half-cent
  *      boundary because Spark rounds `BigDecimal.valueOf(double)` —
  *      the double's shortest round-trip decimal (…"595" → .60) —
  *      while DuckDB rounds the raw double (…5949999… → .59). Found
  *      on q10 row 7 at sf0.01 in round 10.
  *
  * The fix is to never round a double at all: sum exact ×10ᵏ BIGINT
  * fixed-point terms (prices/balances have 2dp, discounts/tax 2dp, so
  * every revenue term is exact at 4dp and every charge term at 6dp),
  * round in INTEGER space (half-up = `(n + d/2) div d`), and divide
  * once at the end — both engines then divide the same integer by the
  * same power of ten and produce bit-identical doubles. DuckDB twins
  * use `//` (sums widen to HUGEINT there, so no overflow either).
  *
  * Overflow/precision bounds: the pmod-based [[money2]] evaluates its
  * intermediate as a double and is exact while `sum4 + 50 < 2^53`
  * (×10⁴ corpus revenue at sf0.1 ≈ 2.4×10¹⁴ — 40× headroom). The
  * expr-based [[divFp]] stays in BIGINT the whole way (Spark's `div`)
  * and has no such bound — ×10⁶ charge sums exceed 2^53 at sf0.1, so
  * q1 uses it. */
private[graft] object Money {

  /** Exact ×10⁴ fixed-point revenue term: extendedprice·(1−discount). */
  def revCents4: Column =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
      .cast("long")

  /** Exact ×100 cents of any 2dp column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** ×10⁴ long sum → 2dp dollars, integer half-up (see class doc).
    * Positive sums below 2^53 only. DuckDB: `((s+50)//100)/100.0`. */
  def money2(sum4: Column): Column =
    ((sum4 + lit(50L)) - pmod(sum4 + lit(50L), lit(100L))) / lit(100L) / lit(100.0)

  /** `round(<bigint col> / 10^dropDigits)` computed wholly in BIGINT
    * via SQL `div` (no 2^53 ceiling), then one exact double division
    * to place the decimal point at `outDp` digits. The input must be
    * a resolvable column NAME (post-agg select), not an expression.
    * DuckDB: `((name + half) // div) / 10^outDp.0`. */
  def divFp(name: String, dropDigits: Int, outDp: Int): Column = {
    val d = math.pow(10, dropDigits).toLong
    // the double division stays in the Column API: a "10000.0" literal
    // inside an expr STRING parses as DECIMAL in Spark SQL and would
    // decimal-taint the whole expression
    expr(s"($name + ${d / 2}L) div ${d}L") / lit(math.pow(10, outDp))
  }

  /** Exact half-up average at 4dp of a BIGINT sum over a BIGINT
    * count: `round(sum·mult/cnt)` as pure integers —
    * `(2·sum·mult + cnt) div (2·cnt)`, then /10⁴. `mult` converts the
    * sum's fixed-point scale to ×10⁴ of the output unit (10000 for a
    * unit-scaled sum like quantities, 100 for a cents sum). Column
    * NAMES only. DuckDB: `((2*sum*mult + cnt) // (2*cnt)) / 10000.0`. */
  def avgFp4(sumName: String, cntName: String, mult: Long): Column =
    expr(s"(2 * $sumName * ${mult}L + $cntName) div (2 * $cntName)") / lit(10000.0)
}
