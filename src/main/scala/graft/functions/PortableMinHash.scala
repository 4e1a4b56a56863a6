package graft.functions

/** Constants of the engine-portable MinHash family.
  *
  * The default MinHash path hashes each n-gram with Spark's `xxhash64`
  * — fast, but not replicable outside the JVM, which leaves the LSH
  * pipeline without a cross-engine oracle. The portable family instead
  * derives every hash from the low 40 bits of [[rolling_hash]] via an
  * affine step:
  *
  *   h_i(g) = (a(i) · h40(g) + b(i)) mod 2^40
  *
  * a(i) is odd, so each h_i is a bijection of Z_2^40 (a valid
  * permutation approximation for MinHash). All intermediates stay below
  * 2^61, so the arithmetic is overflow-free in plain BIGINT — any
  * engine that can fold the rolling hash (see `graft.OracleSql`)
  * reproduces the signatures bit-for-bit.
  */
object PortableMinHash {
  val Mod: Long = 1L << 40
  val Mask: Long = Mod - 1L

  /** Odd multiplier < 2^20 (Knuth multiplicative constant, low bits). */
  def a(i: Int): Long = (((i + 1) * 2654435761L) & 0xFFFFEL) | 1L

  /** Offset < 2^40 (golden-ratio constant). */
  def b(i: Int): Long = ((i + 1) * 0x9E3779B97L) & Mask
}
