package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document's distinct word set in ONE primitive pass
  * per row — tokenize, dedupe, per-token bits, ±1 counters, sign-pack —
  * with no explode and no aggregation exchange at all.
  *
  * The declarative formulation (explode distinct tokens → 64 parallel ±1
  * SUMs grouped by id — Dedup.simhashFromBits) is semantically identical
  * and map-side combinable, but it still evaluates 64 conditional sums per
  * token through codegen'd aggregate buffers and shuffles one 65-column
  * row per document. This expression keeps the 64 counters in a local
  * array, costs one hash per token, and emits the packed long directly —
  * the narrow-scan shape you want when simhashing 100 TB: the downstream
  * banded join is then the ONLY exchange in the near-dup pipeline.
  * Parity-tested against the declarative form in both hash modes.
  *
  * Token-bit sources (matching Dedup.simhash / Dedup.simhashMd5 exactly):
  *  - xxhash64 (md5Base = false): bit j = bit j of Spark's xxhash64(token)
  *    (XXH64, seed 42) — the fast engine-internal default.
  *  - md5 (md5Base = true): bit j = bit (j%4) of md5 hex digit j/4 — the
  *    engine-portable variant every SQL engine can reproduce.
  *
  * Returns NULL when the text has no non-empty tokens (mirrors the
  * declarative form, where such documents simply have no rows to
  * aggregate); callers filter on isNotNull.
  */
case class SimHashBits(child: Expression, md5Base: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): Any = {
    // StrUtil replicates Spark trim (0x20 only) and split("\\s+") — see
    // the MinHashSig note; java.lang.String defaults differ on both.
    val words = StrUtil.splitWs(StrUtil.lowerRoot(StrUtil.sparkTrim(input.toString)))
    val seen = new java.util.HashSet[String](words.length * 2)
    val counts = new Array[Int](64)
    var any = false
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty && seen.add(w)) {
        any = true
        val u = UTF8String.fromString(w)
        if (md5Base) {
          val d = MinHashSig.md5Bytes(u.getBytes)
          var j = 0
          while (j < 64) {
            // hex digit c = nibble c of the digest (high nibble first);
            // bit j = bit (j % 4) of digit j / 4
            val c = j >> 2
            val digit =
              if ((c & 1) == 0) (d(c >> 1) >> 4) & 0xf else d(c >> 1) & 0xf
            if (((digit >> (j & 3)) & 1) == 1) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        } else {
          val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
            u.numBytes, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
      }
      wi += 1
    }
    if (!any) return null
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashBits", this, classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(text: Column, md5Base: Boolean): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(text), md5Base))
}
