package graft

import org.apache.spark.sql.functions._
import graft.ext.Num

/** Num.roundLike must reproduce the oracle's (DuckDB/C) scaled-product
  * half-away-from-zero rounding bit-for-bit. Expected values below were
  * probed directly against DuckDB 1.x `round(CAST(x AS DOUBLE), s)` —
  * including the cases where Spark's own round() disagrees (shortest-
  * decimal-rendering boundaries) and exact-.5 scaled products. */
class NumSpec extends SparkSpec {

  private def rl(x: Double, s: Int): Double =
    spark.range(1).select(Num.roundLike(lit(x), s)).collect()(0).getDouble(0)

  test("roundLike matches DuckDB on boundaries, halves, and negatives") {
    // 0.59625's double renders as "0.59625" but scales to 5962.4999…:
    // DuckDB says 0.5962; Spark's round() says 0.5963
    assert(rl(0.59625, 4) == 0.5962)
    assert(rl(-0.59625, 4) == -0.5962)
    // exact .5 scaled product rounds away from zero (0.01875e4 = 187.5)
    assert(rl(0.01875, 4) == 0.0188)
    assert(rl(-0.01875, 4) == -0.0188)
    // plain cases agree with everything
    assert(rl(0.12345, 4) == 0.1235)
    assert(rl(2.5, 4) == 2.5)
    assert(rl(0.00005, 4) == 0.0001)
    assert(rl(1234.5678, 2) == 1234.57)
    assert(rl(0.0, 6) == 0.0)
  }

  test("roundLike equals Spark round away from display boundaries") {
    val xs = Seq(0.1, 0.123456789, 3.14159, -2.71828, 42.0, 0.999999)
    xs.foreach { x =>
      val both = spark.range(1)
        .select(Num.roundLike(lit(x), 4).as("a"), round(lit(x), 4).as("b"))
        .collect()(0)
      assert(both.getDouble(0) == both.getDouble(1), s"x=$x")
    }
  }
}
