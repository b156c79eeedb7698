package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a text's word k-shingles as ONE tight primitive
  * loop.
  *
  * The pure-Column formulation (split → transform(shingle) → per-permutation
  * array_min(transform(pmod))) is semantically identical but runs on
  * interpreted higher-order functions — `transform`/`aggregate` are
  * CodegenFallback, so every element costs an expression-tree walk with
  * boxing. Measured at sf0.1 that is ~10 s for 5k docs; this expression does
  * the same work in primitive longs in ~0.1 s, and at 100 TB the signature
  * scan is the dominant narrow stage of MinHash-LSH dedup, so it must be
  * cheap.
  *
  * Semantics mirror Dedup.shingles + Dedup.minhashFromHashes exactly:
  * lowercase, whitespace-split, k-word shingles (the whole word list when
  * there are fewer than k words), distinct, murmur3(seed 42) per shingle
  * (Spark's `hash()`), then min over (a_i*h + b_i) mod (2^31-1) per
  * permutation with coefficients from scala.util.Random(seed).
  * Returns an empty array for blank text (callers filter size > 0).
  */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int,
    seed: Int = 42, md5Base: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val coeffs: Array[(Long, Long)] =
    MinHashSig.coefficients(numHashes, seed)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    // StrUtil replicates Spark trim (0x20 only) and split (keeps trailing
    // empties) — java.lang.String's defaults differ on both and would
    // change signatures for tab/newline-edged text.
    val words = StrUtil.splitWs(StrUtil.lowerRoot(StrUtil.sparkTrim(text)))
    // distinct shingle hashes: murmur3(seed 42) — identical to Spark's
    // hash() over the array_join result — or, with md5Base, the first
    // 4 md5 bytes as an unsigned 32-bit value (= the first 8 hex chars of
    // md5(), which any engine can reproduce; see Dedup.minhashNearDupPairs).
    // Dedup is by HASH value; min over a multiset ignores duplicates, so
    // this never changes the signature.
    val n = words.length
    val nShingles = math.max(n - shingleK, 0) + 1
    val seen = new java.util.HashSet[Long](nShingles * 2)
    val hashes = new Array[Long](nShingles)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + shingleK, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      if (sb.length > 0) {
        val u = UTF8String.fromString(sb.toString)
        val h =
          if (md5Base) MinHashSig.md5Head32(u.getBytes)
          else Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
            u.numBytes, 42).toLong
        if (seen.add(h)) { hashes(m) = h; m += 1 }
      }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val p = 2147483647L
    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val (a, b) = coeffs(k)
      var best = Long.MaxValue
      var t = 0
      while (t < m) {
        // murmur h is sign-extended (can be negative), md5 h is unsigned —
        // in both cases |h*a| < 2^63 (|h| < 2^32, a < 2^31), no overflow.
        var r = (hashes(t) * a + b) % p
        if (r < 0) r += p
        if (r < best) best = r
        t += 1
      }
      sig(k) = best
      k += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Same coefficient stream as Dedup.minhashFromHashes (Random(seed)). */
  def coefficients(num: Int, seed: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(num)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
      rnd.nextInt(Int.MaxValue).toLong)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Raw 16-byte md5 digest (thread-local digest instance). */
  def md5Bytes(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Digest.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 4 md5 bytes as an unsigned 32-bit value — numerically equal to
    * parsing the first 8 hex chars of md5() as a base-16 integer, which is
    * how the SQL oracle reproduces it.
    */
  def md5Head32(bytes: Array[Byte]): Long = {
    val h = md5Bytes(bytes)
    (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL))
  }

  def apply(text: Column, shingleK: Int, numHashes: Int): Column =
    apply(text, shingleK, numHashes, md5Base = false)

  def apply(text: Column, shingleK: Int, numHashes: Int, md5Base: Boolean): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(text), shingleK, numHashes,
      md5Base = md5Base))
}
