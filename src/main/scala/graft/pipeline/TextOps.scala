package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared columnar text primitives for the pipeline operators.
  * Everything here is built from codegen'd `functions._` — no UDFs — so the
  * hot path stays inside whole-stage codegen and scales linearly with
  * partitions (no shuffle is introduced by any expression in this file).
  */
object TextOps {

  /** character n-gram shingles (distinct). `c.substr` keeps it columnar. */
  def charShingles(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(c) - n, lit(0))),
      i => c.substr(i + 1, lit(n))))

  /** lowercase word tokens (non-empty). Round 11: the composed
    * `filter(split(lower(c), "[^\\p{L}\\p{N}]+"), length > 0)` form ran
    * interpreted (ArrayFilter is CodegenFallback) and recompiled the
    * regex per row; [[graft.functions.SplitTokens]] is the same token
    * array (TextKernelSpec equivalence lock) in one codegen pass. */
  def tokens(c: Column): Column =
    graft.functions.TextFunctions.split_tokens(
      lower(c), graft.functions.TokenMode.UnicodeAlnum)

  /** word n-grams over the token array. */
  def wordNgrams(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** deterministic 64-bit hash seeded by an integer (seed baked into the
    * hashed bytes — xxhash64's own seed parameter is fixed in the public
    * API). */
  def seededHash(c: Column, seed: Int): Column =
    xxhash64(c, lit(seed))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast(DoubleType) /
        size(array_union(a, b)).cast(DoubleType))
}
