package graft.functions

/** Dense HyperLogLog over a byte-register array — the bounded-state
  * cardinality sketch the streaming state machines keep per key when
  * exact key sets stop fitting (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm",
  * AofA 2007). Plain functions over `Array[Byte]` rather than a class
  * so the registers slot directly into a Spark state-store row
  * (product-encoded case-class field) with no custom serialization.
  *
  * p = 12 → 4096 one-byte registers = a FIXED 4 KiB per state row,
  * standard error 1.04/√4096 ≈ 1.6%. Linear counting handles the
  * small-cardinality range (the hybrid tallies below convert at ~1k,
  * where linear counting is still essentially exact).
  */
object Hll {

  val P = 12
  val M: Int = 1 << P // 4096 registers

  private val alphaMM: Double = (0.7213 / (1.0 + 1.079 / M)) * M.toDouble * M.toDouble

  def empty: Array[Byte] = new Array[Byte](M)

  /** Fold one 64-bit hash into the registers: top-p bits pick the
    * register, the rank of the first 1-bit in the rest is the value. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val w = hash << P
    val rank = if (w == 0L) (64 - P + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** 64-bit string hash: two seeded 32-bit murmurs (the MinHash
    * construction) pushed through a splitmix64 finalizer — the raw
    * concatenation leaves enough structure to cost ~2x the nominal
    * estimation error. */
  def hashString(s: String): Long = {
    var z = scala.util.hashing.MurmurHash3.stringHash(s, 0x2545f491).toLong << 32 |
      (scala.util.hashing.MurmurHash3.stringHash(s, 0x9e3779b9).toLong & 0xffffffffL)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Register-wise max — HLL union is lossless and associative. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** HLL++-style linear-counting threshold for p=12 (Heule et al.,
    * "HyperLogLog in Practice", EDBT 2013): below it the linear
    * counter is more accurate than the raw estimator's biased
    * transition zone. */
  private val LcThreshold = 11500.0

  /** Estimate: linear counting while its own estimate is under the
    * p=12 threshold, raw bias-corrected HLL above it (no large-range
    * correction needed with 64-bit hashes). */
  def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Double.longBitsToDouble((1023L - regs(i)) << 52) // 2^-reg
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val lc = if (zeros > 0) M * math.log(M.toDouble / zeros) else Double.MaxValue
    val corrected = if (lc <= LcThreshold) lc else alphaMM / invSum
    math.rint(corrected).toLong
  }
}
