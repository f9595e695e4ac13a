package graft.util

/** Deterministic 64-bit hash primitives shared by the sketch operators
  * (MinHash permutations, sign-LSH hyperplanes). Pure functions of their
  * inputs — task retries and reruns reproduce identical sketches, which is
  * what makes the LSH operators' outputs stable enough to test.
  */
object Hashing {

  /** 64-bit FNV-1a over a string. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — full-avalanche mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
