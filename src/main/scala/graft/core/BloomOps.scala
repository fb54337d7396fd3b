package graft.core

/**
 * Bloom-filter bit kernels, shared by the aggregate's mutable state
 * ([[graft.operators.BloomAggExpr]]) and the codegen'd membership scalar
 * ([[graft.operators.BloomMightContainExpr]]). Static, allocation-free,
 * branch-light — these run once per candidate row of the BIG side of a
 * join at 100 TB, so they must stay inside whole-stage codegen.
 *
 * Layout of a serialized filter (the BinaryType value the aggregate
 * emits): [numHashes: int LE][numBits: int LE][bitset bytes], where bit
 * `i` of the filter lives at `bytes(8 + (i >>> 3))`, mask `1 << (i & 7)`
 * — i.e. the little-endian image of the builder's Array[Long] words, so
 * serialization is a bulk copy and the probe needs no word re-assembly.
 *
 * Hashing: the caller supplies ONE 64-bit hash of the key (xxhash64 —
 * Spark's codegen'd built-in). The k probe positions derive from it by
 * Kirsch–Mitzenmacher double hashing, h_i = h1 + i·h2, with h1/h2 taken
 * from two independent finalizer mixes (splitmix64's constants — public
 * domain, Steele et al., JDK SplittableRandom). numBits is a power of
 * two so `mod` is a mask.
 */
object BloomOps {

  val HeaderBytes: Int = 8

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Second, independent mix for double hashing; forced odd so the probe
   * stride visits every position of the power-of-two bit space. */
  @inline def mix2(z: Long): Long = mix(z ^ 0xA5A5A5A5A5A5A5A5L) | 1L

  /** Set the k probe bits of `hash` in the builder's word array. */
  def add(words: Array[Long], numBits: Int, numHashes: Int, hash: Long): Unit = {
    val h1 = mix(hash)
    val h2 = mix2(hash)
    val mask = numBits - 1
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = (h & Long.MaxValue).toInt & mask // non-negative before masking
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
      h += h2
    }
  }

  /** Probe a SERIALIZED filter (header + little-endian bitset bytes).
   * False ⇒ the key is definitely absent; true ⇒ probably present. */
  def mightContain(bytes: Array[Byte], hash: Long): Boolean = {
    val numHashes = readIntLE(bytes, 0)
    val numBits = readIntLE(bytes, 4)
    val h1 = mix(hash)
    val h2 = mix2(hash)
    val mask = numBits - 1
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = (h & Long.MaxValue).toInt & mask
      if ((bytes(HeaderBytes + (bit >>> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
      h += h2
    }
    true
  }

  @inline private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Serialize builder words to the probe layout (header + LE bytes). */
  def toBytes(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numHashes).putInt(numBits)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val numHashes = bb.getInt
    val numBits = bb.getInt
    val words = new Array[Long](numBits >>> 6)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (words, numBits, numHashes)
  }

  /** Smallest power of two ≥ `bitsPerKey · expectedKeys`, clamped to
   * [1024, 2^30] (128 MiB of bits — past that, broadcast cost dominates
   * and the caller should shard or skip the runtime filter). */
  def sizeBits(expectedKeys: Long, bitsPerKey: Int): Int = {
    val want = math.max(1024L, math.min(1L << 30, expectedKeys * bitsPerKey))
    java.lang.Long.highestOneBit(want - 1).toInt << 1
  }
}
