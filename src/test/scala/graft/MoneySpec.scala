package graft

import org.apache.spark.sql.functions._
import graft.operators.Money

/** Boundary pins for the fixed-point money helpers (Money.scala) —
  * the arithmetic every relational money output now routes through.
  * Each case is chosen at a rounding boundary where the retired
  * `round(sum(double), k)` forms were engine-divergent. */
class MoneySpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("money2: half-cent boundaries round up, exactly") {
    import spark.implicits._
    val got = Seq(3078435950L, 150L, 149L, 151L, 0L, 99L)
      .toDF("s")
      .select(col("s"), Money.money2(col("s")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3078435950L) == 307843.60) // the q10-row-7 case
    assert(got(150L) == 0.02) // exactly half a cent -> up
    assert(got(149L) == 0.01)
    assert(got(151L) == 0.02)
    assert(got(0L) == 0.0)
    assert(got(99L) == 0.01)
  }

  test("divFp: BIGINT div path beyond 2^53, half rounds up") {
    import spark.implicits._
    // 2^53 + 5000 is not representable as a double +1; the div path
    // must stay exact where a double intermediate cannot
    val big = (1L << 53) + 5000L
    val got = Seq((big, 1)).toDF("c6", "k")
      .select(Money.divFp("c6", 4, 2).as("v")).collect()(0).getDouble(0)
    assert(got == ((big + 5000L) / 10000L) / 100.0, got)
    val half = Seq((15000L, 1)).toDF("c6", "k")
      .select(Money.divFp("c6", 4, 2).as("v")).collect()(0).getDouble(0)
    assert(half == 0.02, half) // 15000e-6 = 0.015 -> half-up -> 0.02
  }

  test("avgFp4: pure-integer average, half up at the 4th decimal") {
    import spark.implicits._
    // sum=1, n=16: 1/16 = 0.0625 exactly -> 4dp half boundary -> .0625
    // is representable; sum=1, n=3: 0.3333...; sum=7, n=2: 3.5 exact
    val got = Seq((1L, 16L), (1L, 3L), (7L, 2L))
      .toDF("s", "n")
      .select(col("s"), col("n"), Money.avgFp4("s", "n", 10000L).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 16L)) == 0.0625)  // 625/10^4, boundary-exact
    assert(got((1L, 3L)) == 0.3333)   // truncating rational, rounds down
    assert(got((7L, 2L)) == 3.5)
  }

  test("cents: 2dp doubles land on exact integers") {
    import spark.implicits._
    val got = Seq(0.01, 0.07, 994.28, -821.16, 68423.46)
      .toDF("p")
      .select(col("p"), Money.cents(col("p")).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.07) == 7L)      // 0.07 * 100 = 7.000000000000001 raw
    assert(got(994.28) == 99428L)
    assert(got(-821.16) == -82116L)
    assert(got(68423.46) == 6842346L)
  }
}
