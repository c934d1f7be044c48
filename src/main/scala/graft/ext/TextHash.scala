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

  /** h(token) ∈ [0, 1e8): digits of md5 hex, zero-padded. Letter-stripping
    * is `translate` (single-pass table lookup), NOT `regexp_replace` — the
    * two are character-for-character identical on `[a-f]` deletion, but the
    * regex engine was measurable across the whole register (this hash runs
    * 4×/token in simhash, k×/token in minhash); the DuckDB twin keeps its
    * regexp spelling — the oracle needn't be fast, only equal.
    */
  def tokenHash(c: Column): Column =
    substring(
      concat(translate(md5(c), "abcdef", ""), lit("00000000")), 1, 8)
      .cast("long")

  /** DuckDB twin of [[tokenHash]] (note the 'g' flag — DuckDB's
    * regexp_replace is first-match-only by default, Spark's is global).
    */
  def tokenHashSql(e: String): String =
    s"CAST(substr(regexp_replace(md5($e), '[a-f]', '', 'g') || '00000000', 1, 8) AS BIGINT)"

  /** 63-BIT portable hash — the production-width counterpart of
    * [[tokenHash]]'s 1e8 space (which biases KMV distinct estimates ~5%
    * by 1e7 distinct per group and saturates near 1e8): three
    * independently salted [[tokenHash]] limbs, 21 bits each
    * (`h mod 2^21`), packed `l0·2^42 | l1·2^21 | l2`. Always
    * non-negative and < 2^63, so it rides a signed BIGINT on BOTH
    * engines with plain integer arithmetic — no HUGEINT wrap needed
    * (every product stays below 2^63; the q111 discipline without the
    * two's-complement step). OR over disjoint bit ranges ≡ addition;
    * Spark uses `shiftleft`+`bitwiseOR` (a bit-63 ADDEND would be the
    * ANSI overflow trap — not reachable here, max bit is 62, but the
    * OR discipline stays uniform). Uniformity: 1e8 = 47.68·2^21, so
    * each limb's residues vary ≤ 1/48 in frequency — ≪ the KMV
    * estimator's 1/√k noise for any practical k.
    */
  def tokenHash63(c: Column): Column = {
    val l0 = tokenHash(c) % lit(2097152L)
    val l1 = tokenHash(concat(c, lit("|1"))) % lit(2097152L)
    val l2 = tokenHash(concat(c, lit("|2"))) % lit(2097152L)
    shiftleft(l0, 42).bitwiseOR(shiftleft(l1, 21)).bitwiseOR(l2)
  }

  /** DuckDB twin of [[tokenHash63]] — shifts written as multiplies
    * (spelled-out powers of two; everything < 2^63 so plain BIGINT).
    */
  def tokenHash63Sql(e: String): String =
    s"((${tokenHashSql(e)} % 2097152) * 4398046511104 + " +
      s"(${tokenHashSql(s"$e || '|1'")} % 2097152) * 2097152 + " +
      s"(${tokenHashSql(s"$e || '|2'")} % 2097152))"
}
