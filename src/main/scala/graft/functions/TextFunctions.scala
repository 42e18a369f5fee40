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

  /** MinHash signature for permutation `perm`: the minimum md5 of
    * `"<perm>|<shingle>"` over the document's shingles. Comparing full
    * 32-hex md5 strings lexicographically equals comparing them as
    * unsigned integers, so `min(hexString)` IS the minhash — no hex
    * parsing, portable across engines.
    */
  def minhashSig(shingles: Column, perm: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$perm|"), s))))

  /** Sum of word lengths (exact integer arithmetic both engines). */
  def sumWordLen(ws: Column): Column =
    aggregate(ws, lit(0), (acc, w) => acc + length(w))

  /** Count of words contained in `markers`. */
  def markerCount(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(markers)))
}
