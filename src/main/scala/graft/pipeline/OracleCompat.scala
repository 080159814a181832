package graft.pipeline

/**
 * Cross-engine conventions for DRIVER-SIDE computation that a DuckDB
 * oracle must replay bit-for-bit. Column-side code needs none of this
 * (Spark's own `round` / binary `UTF8String` ordering already agree with
 * DuckDB); these helpers exist for the bounded driver loops (mixture
 * weights, power iterations, survival folds) whose iteration ORDER and
 * rounding define the IEEE op sequence.
 */
object OracleCompat {

  /** DuckDB-round-compatible 6-dp snap: HALF_UP on the exact binary value
    * = half away from zero, matching both DuckDB `round(x, 6)` and Spark's
    * `round` column function. */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Binary UTF-8 byte ordering — what DuckDB `ORDER BY` and Spark's
    * `UTF8String` comparisons use. Scala's default String ordering is
    * UTF-16 code-unit order, which DISAGREES for supplementary-plane
    * characters (≥ U+10000 sort before [U+E000, U+FFFF] there, after in
    * UTF-8) — a driver-side `.sorted` feeding a mirrored fold must use
    * this ordering or the two engines fold in different orders. */
  val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }
}
