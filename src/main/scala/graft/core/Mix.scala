package graft.core

/** THE splitmix64 finalizer (public constants — Steele, Lea & Flood,
  * "Fast splittable pseudorandom number generators", OOPSLA 2014) —
  * every deterministic "coin" in the engine (k-means‖ selection,
  * point-block sampling, bench fixtures, scale-fixture mutation)
  * derives from this one definition. Five hand-transcribed copies of
  * the mixing constants used to live across graft.sim / graft.tools;
  * a single typo'd constant in one of them would silently change a
  * component's deterministic fixtures with nothing linking the
  * copies.
  */
object Mix {

  /** splitmix64 finalizer. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Uniform double in [0,1) from the finalizer's high 53 bits. */
  def unitDouble(x: Long): Double =
    (splitmix64(x) >>> 11).toDouble / (1L << 53).toDouble
}
