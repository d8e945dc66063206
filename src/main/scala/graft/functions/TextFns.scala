package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Text kernels for the training-data-pipeline operators.
  *
  * Everything that can be a codegen'd builtin composition IS one (shingles,
  * tokens, minhash columns); only simhash / winnowing, which need stateful
  * per-row loops, are Scala UDFs — they sit at the end of narrow stages, so
  * the UDF boundary never blocks a pushdown.
  */
object TextFns {

  /** Distinct character k-gram shingles — pure builtins:
    * sequence + Column.substr + array_distinct (stays in codegen). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - lit(k - 1), lit(0))),
        i => text.substr(i, lit(k))))

  /** Distinct k-gram shingles as 64-bit hashes — native single-pass
    * expression (see [[ShingleHashesExpr]]: the builtin substr composition
    * is O(len²) because UTF8String substring counts codepoints from the
    * string start). Downstream set/minhash ops work on longs. */
  def shingleHashes(text: Column, k: Int): Column =
    ShingleHashesExpr.shingleHashes(text, k)

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** MinHash signature: for each of `numPerms` hash permutations, the min
    * 64-bit hash over the shingle set. Returns array<bigint> of length
    * numPerms. Seeded via an extra hashed column — deterministic.
    *
    * IMPORTANT: pass an already-projected shingle column (a bare attribute),
    * not the shingle-building expression — this expression references its
    * input `numPerms` times, and an inlined non-cheap input would be
    * recomputed per permutation (measured 7× slowdown at sf0.1). */
  def minhashSignature(shingleCol: Column, numPerms: Int): Column =
    array((0 until numPerms).map { p =>
      array_min(transform(shingleCol, sh => xxhash64(sh, lit(p))))
    }: _*)

  /** LSH band keys from a minhash signature: hash each band of `rowsPerBand`
    * consecutive signature entries to one 64-bit band key. Band keys are
    * built from cheap element_at refs over the materialized signature. */
  def lshBands(sig: Column, numPerms: Int, rowsPerBand: Int): Column =
    array((0 until numPerms / rowsPerBand).map { b =>
      val members = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1))
      struct(lit(b).as("band"),
        xxhash64(members :+ lit(b): _*).as("key"))
    }: _*)

  /** 64-bit SimHash over a token array (UDF: needs a 64-slot accumulator). */
  val simhash64: UserDefinedFunction = udf { toks: Seq[String] =>
    val acc = new Array[Int](64)
    toks.foreach { t =>
      // two 32-bit murmurs → one 64-bit token hash, deterministic
      val h = (MurmurHash3.stringHash(t, 0x9747b28c).toLong << 32) |
        (MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    * k-gram rolling hashes, min per sliding window of w, distinct, sorted.
    * Returns array<bigint>. */
  def winnowUdf(k: Int, w: Int): UserDefinedFunction = udf { text: String =>
    val s = if (text == null) "" else text.toLowerCase
    val n = s.length - k + 1
    if (n <= 0) Array.empty[Long]
    else {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        // polynomial rolling hash base 1_000_003 over the k-gram
        var h = 1125899906842597L
        var j = i
        while (j < i + k) { h = h * 1000003L + s.charAt(j); j += 1 }
        hs(i) = h
        i += 1
      }
      val picked = scala.collection.mutable.SortedSet.empty[Long]
      var start = 0
      while (start <= n - w) {
        var m = hs(start)
        var j = start + 1
        while (j < start + w) { if (hs(j) < m) m = hs(j); j += 1 }
        picked += m
        start += 1
      }
      if (picked.isEmpty) picked += hs.min
      picked.toArray
    }
  }

  /** Count of regex matches — builtin composition, identical semantics to
    * the oracle's len(regexp_extract_all(...)). */
  def regexCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
