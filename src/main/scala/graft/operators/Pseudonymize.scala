package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic keyed-hash pseudonymization (A38) — the lake-side
  * privacy transform for KEYED identifiers, complementing C18's free-text
  * PII scrub: each value is replaced by `md5(secret || ':' || value)`, so
  *
  *   - the same value tokenizes identically in EVERY table → joins,
  *     group-bys, and referential integrity survive tokenization;
  *   - without the secret the mapping is not invertible IN PRACTICE —
  *     but the guarantee rests entirely on the pepper staying secret
  *     AND the value domain not being enumerable. `md5(secret || value)`
  *     is not a keyed MAC (length-extension, and md5 preimage margins
  *     are historic): an attacker who learns the pepper, or who can
  *     enumerate a low-entropy domain (integer keys, names) against a
  *     leaked pepper, recovers every mapping. Deployments needing a
  *     cryptographic keyed-PRF guarantee should swap `md5(concat(...))`
  *     for an HMAC-SHA-256 expression; this operator keeps md5 because
  *     the cross-engine oracle (DuckDB md5) is part of the correctness
  *     contract, and the ENGINE property being exercised — deterministic
  *     cross-table tokenization at scan speed — is hash-agnostic;
  *   - re-runs are idempotent — tokenizing twice is detectable (tokens
  *     are fixed-width hex) but applying the transform to fresh loads
  *     of the same entity yields the same token, append-safe.
  *
  * Deletion (GDPR erasure) composes with A33: drop the key's token the
  * same way raw keys are dropped. Nulls stay null — they carry no
  * identity and must not collapse onto one token.
  *
  * Scale shape: map-only codegen (md5 + concat), no shuffle, no state;
  * at 100 TB this runs at scan speed on every table independently,
  * which is exactly what makes the cross-table consistency valuable.
  */
object Pseudonymize {

  def tokenize(df: DataFrame, secret: String,
               cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        md5(concat(lit(secret), lit(":"), col(c).cast("string"))))
    }
}
