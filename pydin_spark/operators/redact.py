"""PII detection and redaction for training-data curation.

Engine extension beyond the reference surface: before a corpus is used
for model training, personally identifiable strings (emails, phone
numbers, IP addresses) are counted and masked. Everything here is
``regexp_extract_all`` / ``regexp_replace`` Column math — JVM-side,
codegen'd, zero Python in the hot path — so a 100 TB corpus is one
linear scan with no shuffle.

The patterns deliberately stay inside the regex subset that behaves
identically under Java regex (Spark) and RE2 (DuckDB), so the DuckDB
oracle reproduces the operator bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: detection patterns, applied in declaration order (email first so the
#: phone/IP rules never see the already-masked local parts)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9][0-9 -]{7,}[0-9]",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

#: replacement mask per kind
PII_MASKS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ip": "<IP>",
}


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               kinds: tuple[str, ...] = ("email", "phone", "ip"),
               ) -> DataFrame:
    """Count and mask PII occurrences per document.

    Returns ``id_col``, one ``n_<kind>`` count column per requested kind
    (counted on the original text), and ``redacted`` — the text with
    every match replaced by its mask, applying the kinds in the given
    order.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(PII_PATTERNS[k]), 0))
        .alias(f"n_{k}")
        for k in kinds
    ]
    redacted = F.col(text_col)
    for k in kinds:
        redacted = F.regexp_replace(redacted, PII_PATTERNS[k],
                                    PII_MASKS[k])
    return df.select(F.col(id_col), *counts, redacted.alias("redacted"))
