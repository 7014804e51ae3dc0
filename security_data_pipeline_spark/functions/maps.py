"""Canonical categorical vocabularies for security events.

Semantics parity with the reference's synonym maps
(``/root/reference/src/normalization.py:57-97``): values are looked up on the
*canonicalized* text (lower, trimmed, separators→underscore), and unmapped
values PASS THROUGH unchanged — they are NOT coerced to ``unknown``
(SURVEY.md §4.3 trap 1).
"""

from __future__ import annotations

# status synonyms → {success, failure, unknown}  (normalization.py:57-74)
STATUS_MAP: dict[str, str] = {
    "ok": "success",
    "pass": "success",
    "passed": "success",
    "success": "success",
    "succeeded": "success",
    "allowed": "success",
    "grant": "success",
    "failure": "failure",
    "failed": "failure",
    "error": "failure",
    "denied": "failure",
    "deny": "failure",
    "blocked": "failure",
    "unauthorized": "failure",
    "unknown": "unknown",
    "": "unknown",
}

# severity synonyms → {info, low, medium, high, critical, unknown}
# (normalization.py:80-97)
SEVERITY_MAP: dict[str, str] = {
    "informational": "info",
    "information": "info",
    "info": "info",
    "notice": "low",
    "low": "low",
    "warn": "medium",
    "warning": "medium",
    "medium": "medium",
    "med": "medium",
    "high": "high",
    "severe": "high",
    "critical": "critical",
    "crit": "critical",
    "emergency": "critical",
    "unknown": "unknown",
    "": "unknown",
}

# ordinal severity encoding; unmapped → NULL (feature_engineering.py:19-31)
SEVERITY_SCORE: dict[str, int] = {
    "info": 0,
    "low": 1,
    "medium": 2,
    "high": 3,
    "critical": 4,
}
