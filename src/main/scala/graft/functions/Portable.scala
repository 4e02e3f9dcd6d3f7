package graft.functions

/** Engine-portable expression fragments, each provided in two exactly
  * equivalent dialects: a Spark SQL expression (used via `expr`) and a
  * DuckDB SQL expression (used in the oracle). The pair MUST compute
  * bit-identical results:
  *
  *  - integer hashing is polynomial (acc*mult + ord(char)) mod a
  *    <2^30 prime, so every intermediate fits a 64-bit signed int in
  *    both engines (DuckDB traps on overflow rather than wrapping);
  *  - float reductions are strict LEFT FOLDS over the same element
  *    order, so double rounding is reproduced bit-for-bit;
  *  - no engine-native hash/random function is ever used.
  *
  * Everything here is a narrow per-row computation: at 100 TB these
  * run inside the scan stage with zero shuffle; MinHash/SimHash
  * signatures in particular are computed per-document from an array
  * column instead of exploding to (doc, shingle, perm) rows, which
  * avoids a 64x data amplification before the first shuffle.
  */
object Portable {

  val P1 = 1000000007L  // < 2^30
  val P2 = 998244353L   // < 2^30
  val TWO30 = 1073741824L

  // ---- Spark SQL dialect -------------------------------------------

  /** words: split on spaces, drop empties (Spark's split keeps a
    * trailing "" under some patterns; DuckDB's does not). */
  def words(e: String): String =
    s"filter(split($e, ' '), w -> w <> '')"

  /** polynomial char hash mod p. */
  def charHash(e: String, mult: Int = 31, p: Long = P1): String =
    s"aggregate(filter(split($e, ''), c -> c <> ''), CAST(0 AS BIGINT), (acc, c) -> (acc * $mult + ascii(c)) % $p)"

  /** 60-bit fingerprint from two independent char hashes. */
  def fp60(e: String): String =
    s"(${charHash(e, 31, P1)} * $TWO30 + ${charHash(e, 37, P2)})"

  /** word 3-gram shingle strings from a words-array expression. */
  def shingles3(wordsArr: String): String =
    s"CASE WHEN size($wordsArr) < 3 THEN array() " +
      s"ELSE transform(sequence(1, size($wordsArr) - 2), i -> concat_ws(' ', slice($wordsArr, i, 3))) END"

  /** strict left-fold dot product of two double-array expressions. */
  def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** cosine similarity via left folds (bit-identical to duckCosine). */
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / sqrt(${dot(a, a)} * ${dot(b, b)}))"

  /** float[] -> double[] */
  def toDouble(arr: String): String = s"transform($arr, x -> CAST(x AS DOUBLE))"

  /** lower + squeeze whitespace + trim ("normalized" text). */
  def normText(e: String): String =
    s"trim(regexp_replace(lower($e), '\\\\s+', ' '))"

  /** per-shingle polynomial hashes from a shingle-array expression. */
  def shingleHashes(shinglesArr: String): String =
    s"transform($shinglesArr, g -> ${charHash("g")})"

  /** 64-permutation MinHash signature from a hash-array expression.
    * Permutation i is the affine map h -> ((2i+5)h + i^2+13) mod P2;
    * computed per-document with a fold, no (doc,shingle,perm) explode. */
  def minhashSig(hashesArr: String): String =
    s"transform(sequence(0, 63), i -> array_min(transform($hashesArr, h -> ((2*i+5)*h + (i*i+13)) % $P2)))"

  /** 16 LSH band keys (4 rows/band) from a 64-long signature; the band
    * index seeds the fold so identical row values in different bands
    * land in different buckets. */
  def minhashBands(sigArr: String): String =
    s"transform(sequence(0, 15), b -> aggregate(slice($sigArr, 4*b+1, 4), CAST(b+1 AS BIGINT), (acc, v) -> (acc*1000003 + v) % 2147483647))"

  /** estimated Jaccard = fraction of agreeing signature positions. */
  def minhashEstJaccard(sa: String, sb: String): String =
    s"(aggregate(zip_with($sa, $sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST(64 AS DOUBLE))"

  /** 60-bit SimHash from a word-hash-array expression: per bit j, the
    * words vote +1/-1 by their j-th hash bit; fingerprint bit j is set
    * iff the vote is positive. */
  def simhash60(hashesArr: String): String =
    s"aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> acc + IF(" +
      s"aggregate($hashesArr, 0, (a, h) -> a + IF((h div shiftleft(CAST(1 AS BIGINT), j)) % 2 = 1, 1, -1)) > 0, " +
      s"shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"

  /** 4 hamming-LSH band keys (15 bits each) from a 60-bit fingerprint. */
  def simhashBands(fp: String): String =
    s"transform(sequence(0, 3), b -> b*32768 + (($fp div shiftleft(CAST(1 AS BIGINT), 15*b)) % 32768))"

  /** deterministic pseudo-random hyperplane component for random-
    * hyperplane LSH: table t, bit j, dim d -> uniform(-0.5, 0.5) via an
    * LCG on the flattened index. Pure arithmetic, identical in both
    * engines. */
  private def hyper(t: String, j: String, d: String): String =
    s"(((1103515245 * CAST(($t*4+$j)*64+$d AS BIGINT) + 12345) % 2147483648) / 2147483648.0 - 0.5)"

  /** 4 random-hyperplane LSH bucket keys (4 bits each) for a 64-dim
    * double-array expression; key embeds the table index. */
  def hyperplaneKeys(v: String): String =
    s"transform(sequence(0, 3), t -> t*16 + aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, j) -> acc*2 + " +
      s"IF(aggregate(sequence(0, 63), CAST(0 AS DOUBLE), (a, d) -> a + element_at($v, d+1) * ${hyper("t", "j", "d")}) >= 0, 1, 0)))"

  // ---- DuckDB dialect (must mirror the above exactly) --------------

  def duckWords(e: String): String =
    s"list_filter(string_split($e, ' '), w -> w <> '')"

  def duckCharHash(e: String, mult: Int = 31, p: Long = P1): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [ord(c) FOR c IN string_split($e, '')]), (acc, c) -> (acc * $mult + c) % $p)"

  def duckFp60(e: String): String =
    s"(${duckCharHash(e, 31, P1)} * $TWO30 + ${duckCharHash(e, 37, P2)})"

  def duckShingles3(wordsArr: String): String =
    s"[array_to_string(list_slice($wordsArr, i, i + 2), ' ') FOR i IN range(1, greatest(len($wordsArr) - 1, 1))]"

  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), [($a)[i] * ($b)[i] FOR i IN range(1, len($a) + 1)]), (acc, v) -> acc + v)"

  def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)} / sqrt(${duckDot(a, a)} * ${duckDot(b, b)}))"

  def duckNormText(e: String): String =
    s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  def duckShingleHashes(shinglesArr: String): String =
    s"list_transform($shinglesArr, g -> ${duckCharHash("g")})"

  def duckMinhashSig(hashesArr: String): String =
    s"list_transform(range(0, 64), i -> list_min(list_transform($hashesArr, h -> ((2*i+5)*h + (i*i+13)) % $P2)))"

  def duckMinhashBands(sigArr: String): String =
    s"list_transform(range(0, 16), b -> list_reduce(list_prepend(CAST(b+1 AS BIGINT), list_slice($sigArr, 4*b+1, 4*b+4)), (acc, v) -> (acc*1000003 + v) % 2147483647))"

  def duckMinhashEstJaccard(sa: String, sb: String): String =
    s"(list_sum(list_transform(range(1, 65), i -> CASE WHEN ($sa)[i] = ($sb)[i] THEN 1 ELSE 0 END)) / 64.0)"

  def duckSimhash60(hashesArr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 60), j -> CASE WHEN " +
      s"list_sum(list_transform($hashesArr, h -> CASE WHEN (h // (CAST(1 AS BIGINT) << j)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 " +
      s"THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)), (acc, v) -> acc + v)"

  def duckSimhashBands(fp: String): String =
    s"list_transform(range(0, 4), b -> b*32768 + (($fp // (CAST(1 AS BIGINT) << (15*b))) % 32768))"

  private def duckHyper(t: String, j: String, d: String): String =
    s"(((1103515245 * CAST(($t*4+$j)*64+$d AS BIGINT) + 12345) % 2147483648) / 2147483648.0 - 0.5)"

  def duckHyperplaneKeys(v: String): String =
    s"list_transform(range(0, 4), t -> t*16 + list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 4), j -> " +
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(0, 64), d -> ($v)[d+1] * ${duckHyper("t", "j", "d")})), (a, x) -> a + x) >= 0 " +
      s"THEN 1 ELSE 0 END)), (acc, b) -> acc*2 + b))"
}
