"""PII detection and scrubbing — the standard pre-training redaction
pass (emails, URLs, IPv4 addresses, phone-like numbers).

No reference counterpart (RADAR-base/radarpipeline has no text
analytics).  Pure Catalyst regex expressions — whole-stage codegen,
zero exchanges, no UDFs — in the ``text.py`` family style.

Regex dialect: patterns stay inside the Java-regex ∩ RE2 common
subset (basic character classes, bounded quantifiers, no lookaround,
no backreferences) so the DuckDB oracle twin evaluates the IDENTICAL
pattern bytes; both engines use leftmost-first match semantics, which
agree on these alternation-free patterns.  Patterns reach Spark via
``F.lit`` (no SQL-string escaping layer) and DuckDB via a standard
string literal — the same bytes on both sides.

Shape at 100 TB: both operators are per-row projections in the scan
stage — ZERO exchanges, trivially linear.  ``pii_scrub`` chains
``regexp_replace`` in a fixed order (URLs before emails, so the
user@host authority inside a URL is redacted as part of the URL, not
mangled into a half-scrubbed email).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ordered — pii_scrub applies top to bottom; counts are independent
# per category over the ORIGINAL text (overlaps count in both).
#
# Every quantifier that can overlap a failing-start retry is BOUNDED
# (r6): Java's backtracking matcher retries a failed match at every
# start position, so an UNBOUNDED local-part/digit-run class is
# O(run²) on pathological inputs — measured 59s on ONE 200k-char
# unbroken token under a backtracking engine (a single adversarial
# document would stall an executor task for minutes), while RE2 stays
# linear.  RFC bounds (64-char local part, 255-char domain, 18-char
# phone run) make per-start work constant => whole-document linear in
# BOTH engines, with identical pattern bytes (RE2 supports bounded
# repetition; no possessive quantifiers / lookaround, which RE2
# lacks).  Semantics change only on degenerate inputs (a >64-char
# local part matches its tail; a 200k-digit run scrubs as many
# 20-char phones instead of one run) — pinned by
# test_pii_adversarial_inputs_stay_linear.
#
# Scrub-coverage trade (ADVICE r6, accepted): on a >64-char local part
# pii_scrub redacts only the trailing 64 chars + domain, leaving the
# prefix bytes — such addresses are RFC-invalid (RFC 5321 §4.5.3.1
# caps the local part at 64 octets) and the prefix alone is not a
# deliverable address, so linearity in both engines is worth more
# than total redaction of malformed inputs.  Deployments that want
# belt-and-braces coverage can add a second regexp_replace pass
# widening any match left over the same local-part charset; we keep
# the single linear pass as the default.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^ ]+",
    "email": r"[A-Za-z0-9._%+\-]{1,64}@[A-Za-z0-9.\-]{1,255}\.[A-Za-z]{2,24}",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9()\-]{7,18}[0-9]",
}


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII match counts: (id, n_urls, n_emails, n_ips,
    n_phones, has_pii).  Counts are independent per category over the
    original text (a URL containing an email-shaped authority counts
    for both)."""
    counts = {
        name: F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        .cast("long")
        .alias(f"n_{name}s")
        for name, pat in PII_PATTERNS.items()
    }
    out = df.select(F.col(id_col), *counts.values())
    return out.select(
        id_col,
        *[f"n_{name}s" for name in PII_PATTERNS],
        (
            sum((F.col(f"n_{name}s") for name in PII_PATTERNS), F.lit(0))
            > 0
        ).alias("has_pii"),
    )


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII in ``text_col``: each category's matches are replaced
    by its placeholder token (``<URL>``, ``<EMAIL>``, ``<IP>``,
    ``<PHONE>``), applied in ``PII_PATTERNS`` order.  Output keeps the
    id and the scrubbed text as ``text`` plus the original length for
    audit."""
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(
            scrubbed, F.lit(pat), F.lit(f"<{name.upper()}>")
        )
    return df.select(
        F.col(id_col),
        scrubbed.alias("text"),
        F.length(text_col).cast("long").alias("orig_len"),
    )
