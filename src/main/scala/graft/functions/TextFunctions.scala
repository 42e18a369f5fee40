package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators, all built
  * from codegen'd `org.apache.spark.sql.functions` — no UDFs, so every
  * metric stays inside WholeStageCodegen and scales linearly over
  * partitions.
  *
  * Cross-engine policy: hashing uses md5 (bit-identical in Spark and
  * DuckDB) rather than the engines' builtin `hash`/`xxhash64`, so MinHash
  * signatures and dedup keys are portable (SURVEY.md §5).
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus). */
  def words(text: Column): Column = split(text, " ")

  /** Word 3-shingles: ["a b c", "b c d", ...]; empty below 3 words. */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** MinHash permutation constants: (a, b) pairs for the universal
    * hash family h_j(x) = (a_j·x + b_j) mod p, p = 2^31-1 (the scheme
    * Spark MLlib's MinHashLSH uses, with fixed constants instead of a
    * seeded draw so a SQL oracle can rebuild them). One md5 per
    * shingle feeds every permutation — 8× less digest work than
    * hashing per-permutation, the dominant cost of MinHash at corpus
    * scale.
    */
  val minhashP = 2147483647L // 2^31-1
  val minhashPerms: Array[(Long, Long)] = Array(
    (1000003L, 12345L), (1299721L, 54321L), (15485863L, 98765L),
    (32452843L, 11111L), (49979687L, 22222L), (67867967L, 33333L),
    (86028121L, 44444L), (104395301L, 55555L))

  /** First 52 bits of md5 as a long Column (codegen'd) — the Column
    * form of [[TextKernels.md5Prefix52]]; the DuckDB replica is
    * [[hexPrefix52Sql]].
    */
  def hexPrefix52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** Base shingle hash: the 52-bit md5 prefix mod p. */
  def minhashBase(shingle: Column): Column =
    hexPrefix52(shingle) % minhashP

  /** DuckDB fragment parsing the first 13 hex chars of `hexExpr` (a hex
    * string expression) to a BIGINT — the SQL replica of
    * [[TextKernels.md5Prefix52]].
    */
  def hexPrefix52Sql(hexExpr: String): String =
    s"list_sum(list_transform(range(1,14), t -> " +
      s"(strpos('0123456789abcdef', substr($hexExpr, t, 1)) - 1) * CAST(16^(13-t) AS BIGINT)))"

  /** MinHash signature for permutation `perm` over pre-hashed shingle
    * values (see [[minhashBase]]).
    */
  def minhashSig(baseHashes: Column, perm: Int): Column = {
    val (a, b) = minhashPerms(perm)
    array_min(transform(baseHashes, h => (lit(a) * h + lit(b)) % minhashP))
  }

  /** Sum of word lengths (exact integer arithmetic both engines). */
  def sumWordLen(ws: Column): Column =
    aggregate(ws, lit(0), (acc, w) => acc + length(w))

  /** Count of words contained in `markers`. */
  def markerCount(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(markers)))
}
