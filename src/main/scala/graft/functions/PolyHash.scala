package graft.functions

/** Engine-agnostic hashing basis shared by the signature expressions and the
  * DuckDB oracle SQL the driver replays.
  *
  * xxhash64 is Spark-specific: a query keyed on it can never be checked
  * against another engine. Everything here is plain modular integer
  * arithmetic over Unicode code points — expressible identically in any SQL
  * dialect with BIGINT (`(acc*31 + ascii(substr(s,i,1))) % 1000000007`, the
  * formulation proven cross-engine by the `doc_fingerprint` oracle):
  *
  *  - `h1`: polynomial rolling hash, base 31 mod 1e9+7 (< 2^30);
  *  - `h2`: base 131 mod 998244353 (< 2^30) — independent second hash;
  *  - 60-bit combined hash `h1 | h2 << 30` for SimHash;
  *  - affine min-wise family g_k(x) = (a_k·x + b_k) mod 1e9+7 with
  *    splitmix64-derived constants (a_k ∈ [1, p), b_k ∈ [0, p): products
  *    stay < 2^60, no overflow in any engine's BIGINT);
  *  - deterministic random-hyperplane components in [-1, 1) for LSH.
  *
  * All constants are generated here and interpolated as literals into the
  * oracle SQL, so both engines evaluate the exact same function.
  */
object PolyHash {
  val P1 = 1000000007L
  val B1 = 31L
  val P2 = 998244353L
  val B2 = 131L

  def splitmix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Base-`b` polynomial hash of the string's code points, mod `p` —
    * identical to SQL `list_reduce(list_prepend(0, list_transform(...,
    * i -> ascii(substr(s,i,1)))), (a,c) -> (a*b + c) % p)`.
    */
  def poly(s: String, b: Long, p: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * b + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  def h1(s: String): Long = poly(s, B1, P1)
  def h2(s: String): Long = poly(s, B2, P2)

  /** 60-bit combined hash: independent 30-bit halves. */
  def h60(s: String): Long = h1(s) | (h2(s) << 30)

  /** Min-wise affine constants: (a_k, b_k) with a_k ∈ [1, P1), b_k ∈ [0, P1). */
  def minhashAffine(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(i => Math.floorMod(splitmix(2L * i), P1 - 1) + 1)
    val b = Array.tabulate(numHashes)(i => Math.floorMod(splitmix(2L * i + 1), P1))
    (a, b)
  }

  /** Hyperplane component for (plane p, dimension d): top 53 bits of
    * splitmix64 as a double in [-1, 1). Deterministic across engines — the
    * oracle embeds these values as double literals.
    */
  def planeComponent(p: Int, d: Int): Double =
    (splitmix(p.toLong * 4099L + d) >>> 11).toDouble / (1L << 52).toDouble - 1.0

  def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)(planeComponent)
}
