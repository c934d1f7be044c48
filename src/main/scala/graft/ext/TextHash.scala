package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic token hashing, computable identically in Spark and
  * DuckDB SQL (the oracle twin): strip the hex letters from md5, pad with
  * zeros, take 8 digits → a stable non-negative long < 1e8. Chosen over
  * engine hash builtins (xxhash64 / duckdb hash) precisely because those
  * differ across engines.
  */
object TextHash {
  /** Modulus for all rolling/minhash arithmetic (fits products in a long). */
  val P = 1000000007L

  /** (a, b) affine seeds for the minhash family; a·h_max ≈ 5.8e14 << 2^63. */
  val Seeds: Seq[(Long, Long)] = Seq(
    (1299721L, 104729L),
    (2750161L, 224737L),
    (4256233L, 350377L),
    (5800079L, 499979L))

  /** h(token) ∈ [0, 1e8): digits of md5 hex, zero-padded. */
  def tokenHash(c: Column): Column =
    substring(
      concat(regexp_replace(md5(c), "[a-f]", ""), lit("00000000")), 1, 8)
      .cast("long")

  /** DuckDB twin of [[tokenHash]] (note the 'g' flag — DuckDB's
    * regexp_replace is first-match-only by default, Spark's is global).
    */
  def tokenHashSql(e: String): String =
    s"CAST(substr(regexp_replace(md5($e), '[a-f]', '', 'g') || '00000000', 1, 8) AS BIGINT)"
}
