package graft.functions

/** SplitMix64 finalizer — the single source of deterministic pseudo-random
  * constants (LSH hyperplane weights, universal-hash parameters). Keeping
  * one copy matters: a drifted edit in one consumer would silently
  * desynchronize derived hash families across modules.
  */
object SplitMix {
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
