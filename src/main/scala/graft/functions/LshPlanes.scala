package graft.functions

/** Deterministic pseudo-random ±1 hyperplanes shared by every LSH surface
  * (SimilarityQueries' bucketed top-k, its DuckDB oracle generator, and
  * plans.LshJoinRewrite): component (h, d) is the low bit of a
  * splitmix-style integer mix evaluated at PLAN time in Scala, so plans
  * carry plain float literals and nothing nondeterministic ever executes —
  * the property that lets LSH queries be hash-oracled at all.
  */
object LshPlanes {

  def plane(h: Int, dim: Int): Seq[Float] =
    (0 until dim).map { d =>
      var z = (h.toLong * dim + d) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0f else -1.0f
    }
}
