package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ext.Similarity

/** Bit-identity proof for the fused native cosine expression.
  *
  * [[Similarity.cosine]] (CosineSimExpr, one fused loop) must be
  * BIT-IDENTICAL to [[Similarity.cosineComposed]] (the independently
  * derived `zip_with`/`aggregate` composition it replaced) — identical
  * down to `doubleToRawLongBits`, including NULL and NaN cases — so
  * that swapping it into the oracle-pinned similarity/dedup queries
  * changes no hashes. Division mirrors Spark's `Divide` under BOTH
  * ANSI modes: zero divisor throws DIVIDE_BY_ZERO when ANSI is on
  * (like the composed form does) and yields NULL when off.
  * Both the codegen path and the interpreted (`nullSafeEval`) path are
  * exercised.
  */
class CosineExprSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    // rows whose divisor is exactly 0 (empty / zero-norm): ANSI throws
    StructField("divzero", BooleanType, nullable = false),
    StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))

  /** Deterministic fixture: random vectors at several magnitudes plus
    * every null/shape edge the composed form distinguishes. */
  private def fixture: DataFrame = {
    val rnd = new scala.util.Random(0xC051EL)
    def vec(n: Int, scale: Double): Seq[java.lang.Double] =
      Seq.fill(n)(java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * scale))
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    var id = 0
    def add(a: Seq[java.lang.Double], b: Seq[java.lang.Double],
            divzero: Boolean = false): Unit = {
      rows += Row(id, divzero, a, b); id += 1
    }
    // random pairs across magnitudes and dims
    for (n <- Seq(1, 2, 7, 64); scale <- Seq(1e-3, 1.0, 1e6); _ <- 0 until 4)
      add(vec(n, scale), vec(n, scale))
    // edge cases
    add(Seq.empty, Seq.empty, divzero = true)                 // 0/0
    add(Seq(java.lang.Double.valueOf(0.0)),
      Seq(java.lang.Double.valueOf(0.0)), divzero = true)     // zero norm
    add(vec(3, 1.0), vec(5, 1.0))                             // length mismatch -> null
    add(vec(5, 1.0), vec(3, 1.0))                             // ... both directions
    add(Seq(java.lang.Double.valueOf(1.0), null), vec(2, 1.0)) // null element -> null
    add(vec(2, 1.0), Seq(null, java.lang.Double.valueOf(1.0)))
    add(null, vec(2, 1.0))                                    // null array -> null
    add(vec(2, 1.0), null)
    add(Seq(java.lang.Double.valueOf(Double.NaN)), vec(1, 1.0)) // NaN propagates
    add(Seq(java.lang.Double.valueOf(Double.PositiveInfinity)), vec(1, 1.0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
  }

  private def bitsOf(rows: Array[Row]): Seq[(Int, Option[Long])] =
    rows.map { r =>
      (r.getInt(0),
        if (r.isNullAt(1)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    }.toSeq

  /** Both forms over `df`; columns CONSTRUCTED inside the current conf
    * (failOnError is captured at construction, like Divide's). */
  private def run(df: DataFrame): (Seq[(Int, Option[Long])], Seq[(Int, Option[Long])]) = {
    val fused = bitsOf(df.select(col("id"),
      Similarity.cosine(col("a"), col("b")).as("c")).orderBy("id").collect())
    val composed = bitsOf(df.select(col("id"),
      Similarity.cosineComposed(col("a"), col("b")).as("c")).orderBy("id").collect())
    (fused, composed)
  }

  private def withConf(key: String, value: String)(f: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bit-identical under ANSI on the non-throwing rows; zero divisor throws in both") {
    val df = fixture
    val (fused, composed) = run(df.filter(!col("divzero")))
    assert(fused == composed)
    // null and NaN outputs are really exercised
    assert(fused.exists(_._2.isEmpty))
    assert(fused.exists(_._2.exists(b => java.lang.Double.longBitsToDouble(b).isNaN)))
    // ANSI: empty / zero-norm input -> DIVIDE_BY_ZERO from BOTH forms
    val dz = df.filter(col("divzero"))
    for (c <- Seq(Similarity.cosine(col("a"), col("b")),
                  Similarity.cosineComposed(col("a"), col("b")))) {
      val e = intercept[Exception] { dz.select(c).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("DIVIDE_BY_ZERO")), s"got: $e")
    }
  }

  test("bit-identical on ALL rows with ANSI off (zero divisor -> NULL)") {
    withConf("spark.sql.ansi.enabled", "false") {
      val (fused, composed) = run(fixture)
      assert(fused == composed)
    }
  }

  test("bit-identical on the interpreted (no-codegen) path") {
    withConf("spark.sql.codegen.factoryMode", "NO_CODEGEN") {
      val (fused, composed) = run(fixture.filter(!col("divzero")))
      assert(fused == composed)
    }
  }

  test("fused cosine stays inside whole-stage codegen") {
    val df = fixture.select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("c"))
      .filter(col("c") > lit(-2.0))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Project") || plan.contains("*(1) Filter"),
      s"expected the projection inside a codegen span, got:\n$plan")
  }
}
