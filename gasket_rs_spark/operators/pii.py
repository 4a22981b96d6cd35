"""PII detection / redaction operators — the scrubbing pass a training-data
pipeline runs before a corpus ships (reference has no PII surface; this is
part of the beyond-mandate LLM-pipeline tier alongside dedup/quality).

Everything is JVM-side ``regexp_replace`` / ``regexp_extract_all`` inside
whole-stage codegen — a narrow map over the scanned columns with NO
shuffle and no Python in the hot path. At 100 TB redaction is purely
scan-bound; the only aggregation is the (tiny) per-class hit summary.

The synthetic corpus carries structured ids (``Customer#000000042``) as
its PII stand-in; the email/digit-run patterns in the corpus scan mirror
what a real deployment would use, over the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load

_DIGIT = "[0-9]"
_NON_DIGIT = "[^0-9]"
# email-ish and long-digit-run detectors for the corpus scan
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_DIGIT_RUN_RE = "[0-9]{6,}"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level redaction: mask every digit in the customer name with
    '#', count the digits masked, and flag rows that contained an id-like
    digit run. The masked column is what leaves the pipeline; the count
    is the audit trail."""
    customer = load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_replace("c_name", _DIGIT, "#").alias("masked_name"),
        F.length(F.regexp_replace("c_name", _NON_DIGIT, ""))
        .cast("bigint")
        .alias("n_digits"),
        (F.col("c_name").rlike(_DIGIT_RUN_RE)).alias("has_id_run"),
    )


def q_pii_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII scan summary: documents scanned, docs with
    email-like hits, docs with long digit runs, total hits per class.
    One narrow projection + a single-row aggregate — the cheap audit
    query run before and after a redaction pass."""
    docs = load(spark, sf_dir, "documents")
    scanned = docs.select(
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(_DIGIT_RUN_RE), 0)).alias(
            "n_digit_run"
        ),
    )
    return scanned.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("bigint")).alias("docs_with_email"),
        F.sum((F.col("n_digit_run") > 0).cast("bigint")).alias("docs_with_digit_run"),
        F.sum("n_email").cast("bigint").alias("total_email_hits"),
        F.sum("n_digit_run").cast("bigint").alias("total_digit_run_hits"),
    )


def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation, audited: a deterministic
    erasure list (user_id % 97 == 0 — the stand-in for a deletion-request
    table) is scrubbed from the events fact via anti-join, and the
    witness emits the compliance evidence per event_type: rows before,
    rows after, rows erased, and — the self-audit every DPO asks for —
    the count of erased-user rows REMAINING after the scrub (must be 0,
    and being part of the hashed output, the oracle proves it is).

    Scale: the erasure list is a broadcast anti-join against the fact
    (deletion requests are always dim-sized); the audit is one
    aggregation. The same plan serves TTL enforcement with a time
    predicate in place of the key list."""
    ev = load(spark, sf_dir, "events")
    erase = ev.select("user_id").distinct().where(F.col("user_id") % 97 == 0)
    scrubbed = ev.join(F.broadcast(erase), "user_id", "left_anti")
    before = ev.groupBy("event_type").agg(F.count("*").alias("n_before"))
    after = scrubbed.groupBy("event_type").agg(F.count("*").alias("n_after"))
    leak = (
        scrubbed.join(F.broadcast(erase), "user_id")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_leaked"))
    )
    return (
        before.join(after, "event_type", "left")
        .join(leak, "event_type", "left")
        .select(
            "event_type",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            (F.col("n_before") - F.coalesce("n_after", F.lit(0))).alias("n_erased"),
            F.coalesce("n_leaked", F.lit(0)).alias("n_leaked"),
        )
    )


ORACLES: dict[str, str] = {
    "gdpr_erasure_audit": """
        WITH erase AS (
            SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
        ), before_t AS (
            SELECT event_type, count(*) AS n_before FROM events GROUP BY 1
        ), after_t AS (
            SELECT event_type, count(*) AS n_after
            FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM erase x WHERE x.user_id = e.user_id)
            GROUP BY 1
        )
        SELECT b.event_type, b.n_before,
               coalesce(a.n_after, 0) AS n_after,
               b.n_before - coalesce(a.n_after, 0) AS n_erased,
               CAST(0 AS BIGINT) AS n_leaked
        FROM before_t b LEFT JOIN after_t a USING (event_type)
    """,
    "pii_redact": """
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
               CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS BIGINT)
                   AS n_digits,
               regexp_matches(c_name, '[0-9]{6,}') AS has_id_run
        FROM customer
    """,
    "pii_scan_docs": """
        WITH scanned AS (
            SELECT len(regexp_extract_all(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
                   len(regexp_extract_all(text, '[0-9]{6,}')) AS n_digit_run
            FROM documents
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_email,
               CAST(sum(CASE WHEN n_digit_run > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_digit_run,
               CAST(sum(n_email) AS BIGINT) AS total_email_hits,
               CAST(sum(n_digit_run) AS BIGINT) AS total_digit_run_hits
        FROM scanned
    """,
}
