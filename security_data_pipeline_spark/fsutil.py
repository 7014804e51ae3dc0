"""Filesystem-error discrimination shared by every state/manifest reader.

One copy of the PATH_NOT_FOUND probe: fallback-on-missing readers (the
streaming whole-state folds, the layout manifest reader) must take their
fallback ONLY when the path is genuinely absent — any other read error
(schema mismatch, torn files, permissions) has to propagate, or a
corrupted primary would silently serve a stale fallback.
"""

from __future__ import annotations


def missing_path(e) -> bool:
    """True iff ``e`` (an AnalysisException) is a missing-path read:
    structured error class first (stable API), message text as the
    fallback for runtimes that predate error classes."""
    return _condition_is(e, "PATH_NOT_FOUND", "Path does not exist")


def schemaless_path(e) -> bool:
    """True iff ``e`` is UNABLE_TO_INFER_SCHEMA: the path exists but holds
    no parquet footers to infer from. Distinct from :func:`missing_path`
    because committed-but-empty state is a real state, not an absent one:
    a PARTITIONED write of zero rows emits only ``_SUCCESS`` (no part
    files, no schema), so an all-empty-batches index directory reads as
    schemaless even though every batch committed. Readers that know the
    logical schema (or can treat empty-as-empty) should catch this and
    substitute the empty relation; corrupt-footer errors are a different
    class and still propagate."""
    return _condition_is(e, "UNABLE_TO_INFER_SCHEMA", "Unable to infer schema")


def _condition_is(e, condition: str, legacy_needle: str) -> bool:
    for probe in ("getCondition", "getErrorClass"):
        try:
            cond = getattr(e, probe)()
        except Exception:
            continue
        if cond is not None:
            return cond == condition
    return condition in str(e) or legacy_needle in str(e)
