package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS scheme): rolling polynomial hashes of character k-grams over
  * the normalized text, then the minimum hash of every window of `w`
  * consecutive k-gram hashes (rightmost minimum, the "robust" variant),
  * distinct and sorted.
  *
  * Guarantee: any shared substring of length >= w + k - 1 between two
  * documents contributes at least one common selected hash — unlike the
  * md5 whole-document fingerprint (TextStats.fingerprint, exact-dup only),
  * the signature supports CONTAINMENT detection (quotes, boilerplate,
  * near-total overlap) by intersecting arrays.
  *
  * Normalization: lowercase (Locale.ROOT) and keep only [a-z0-9] code
  * units, so whitespace/punctuation reflows don't perturb the k-grams.
  * Texts with fewer than k normalized chars yield an empty array.
  *
  * Scale shape: one narrow pass per document (O(len)); downstream near-dup
  * mining explodes the array and bucket-joins on the hash — the same
  * bounded equi-join pattern as MinHash-LSH, never all-pairs.
  */
case class WinnowSig(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k >= 2, w >= 1 (got k=$k, w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_sig"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val s = input.toString
    // normalize: lowercase, [a-z0-9] only
    val sb = new java.lang.StringBuilder(s.length)
    val lower = StrUtil.lowerRoot(s)
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      i += 1
    }
    val n = sb.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)

    // rolling polynomial hash base 31 over 64-bit wrap-around
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L // 31^(k-1)
    var h = 0L
    i = 0
    while (i < k) {
      h = h * 31 + sb.charAt(i)
      if (i < k - 1) pow *= 31
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - sb.charAt(i - 1) * pow) * 31 + sb.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }

    // robust winnowing: rightmost minimum of each w-window of hashes;
    // record each selected position once
    val selected = new java.util.TreeSet[java.lang.Long]()
    var win = 0
    val last = math.max(m - w, 0)
    while (win <= last) {
      val end = math.min(win + w, m)
      var best = win
      var j = win
      while (j < end) {
        if (hashes(j) <= hashes(best)) best = j // rightmost min
        j += 1
      }
      selected.add(hashes(best))
      win += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowSig", this, classOf[WinnowSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSig =
    copy(child = newChild)
}

object WinnowSig {
  def apply(text: Column, k: Int = 5, w: Int = 4): Column =
    GraftBridge.column(WinnowSig(GraftBridge.expression(text), k, w))
}
