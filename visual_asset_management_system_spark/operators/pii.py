"""PII detection and redaction over a text corpus.

A standard pre-training hygiene pass (public precedent: the Dolma and
FineWeb pipelines, and the reference's own GenAI-labeling pipeline
boundary — backendPipelines/genAi — where free-text flows to external
models): find spans matching structured-PII shapes and mask them
before the corpus leaves the trust boundary.

Design: every pattern is a single JVM-side regex applied with
``regexp_count`` / ``regexp_replace`` — whole-stage-codegen eligible,
no Python in the hot path, embarrassingly parallel (no shuffle). The
pattern dialect is restricted to the intersection of Java regex and
RE2 (no lookaround, no backrefs) so the DuckDB differential oracle
runs the byte-identical patterns.

100 TB posture: a pure map stage — scales linearly with executors;
combine with ``quality_score``/``lang_id`` in one projection so the
corpus is read once (see q_pipeline_preprocess for the composition
pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detection patterns, applied (and redacted) in THIS order. Insertion
#: order matters for redaction: earlier replacements change the text the
#: later patterns see — the oracle must apply the same order.
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld — deliberately simple; no lookaround (RE2)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # US SSN shape 3-2-4 — MUST precede phone (a phone pattern with
    # flexible groups could otherwise eat SSN-adjacent digits)
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # NANP-ish phone 3-3-4 with -/. separators
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    # dotted-quad IPv4 (over-matches >255 octets; hygiene-pass standard)
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<kind> bigint`` count column per pattern."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]


def redact(text: Column) -> Column:
    """Mask every PII span with ``[<KIND>]``, patterns applied in
    declaration order (email → ssn → phone → ipv4)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def scan_corpus(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit: (*id, n_email, n_ssn, n_phone, n_ipv4,
    redacted). Single projection — the only shuffle is the
    parallelism guard when the input has fewer splits than cores."""
    from .partitioning import ensure_min_parallelism

    text = F.col(text_col)
    return ensure_min_parallelism(df).select(
        F.col(id_col),
        *pii_counts(text),
        redact(text).alias("redacted"),
    )
