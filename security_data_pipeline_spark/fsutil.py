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
    for probe in ("getCondition", "getErrorClass"):
        try:
            cond = getattr(e, probe)()
        except Exception:
            continue
        if cond is not None:
            return cond == "PATH_NOT_FOUND"
    return "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)
