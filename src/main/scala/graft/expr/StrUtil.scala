package graft.expr

/** Shared string helpers replicating SPARK's semantics exactly (which
  * differ from java.lang.String's defaults in two traps):
  *  - Spark `trim()` strips 0x20 ONLY; String.trim strips all chars <= 0x20.
  *  - Spark `split(str, re)` uses limit -1 (KEEPS trailing empty tokens);
  *    String.split(re) uses limit 0 (drops them).
  */
object StrUtil {

  /** Spark-trim: strip leading/trailing spaces (0x20) only. */
  def sparkTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  /** Spark-split on whitespace runs: keeps leading AND trailing empties
    * like Spark's split(col, "\\s+") (limit -1).
    */
  def splitWs(s: String): Array[String] = s.split("\\s+", -1)

  /** Locale-independent lowercase. JVM-default-locale toLowerCase breaks
    * bit-parity with Spark's `lower()` under e.g. a Turkish default locale
    * ('I' → dotless 'ı'); Locale.ROOT matches UTF8String's behavior.
    */
  def lowerRoot(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
}
