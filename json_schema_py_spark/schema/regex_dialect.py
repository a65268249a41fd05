"""Compile-time Python↔Java regex dialect audit (SURVEY.md §7 hard-part 5).

The Column engine's ``rlike`` runs java.util.regex; the reference (and
pyeval / validate_json_exact) run CPython ``re``. For the overwhelming
majority of schema patterns the dialects agree (search-anchored, classes,
quantifiers, anchors, alternation). The constructs below are where they
diverge — the ruleset compiler flags them at COMPILE time so a pattern never
silently validates differently on the two paths; route affected rulesets
through ``validate_json_exact`` (exact CPython semantics, Arrow-batched).
"""

from __future__ import annotations

import re
import warnings

# (detector, why it differs)
_DIVERGENT: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\(\?P<"), "named groups: Python (?P<name>...) vs Java (?<name>...)"),
    (re.compile(r"\(\?P="), "named backrefs: Python (?P=name) vs Java \\k<name>"),
    (re.compile(r"\(\?#"), "comment groups (?#...) are Python-only"),
    (re.compile(r"\\Z"), "\\Z: absolute end in Python, before-final-terminator in Java"),
    (re.compile(r"(?<!\\)\\[0-9]{2,}"), "multi-digit backrefs parse differently"),
    (re.compile(r"[*+?}]\+"), "possessive quantifiers (a*+) are Java-only"),
    (re.compile(r"\(\?[aLu]"), "inline flags a/L/u are Python-only"),
]


class RegexDialectWarning(UserWarning):
    """A ruleset pattern behaves differently under Java regex (rlike) than
    under CPython re — use the exact pandas path for bit-exact parity."""


def portability_issues(pattern: str) -> list[str]:
    return [why for det, why in _DIVERGENT if det.search(pattern)]


def to_java_pattern(pattern: str) -> str:
    """Translate the mechanically-translatable Python-only constructs into
    their Java spellings (named groups, named backrefs, comment groups).
    Constructs with no Java equivalent are left as-is — the compile-time JVM
    check below fails fast instead of crashing per-row at runtime."""
    p = re.sub(r"\(\?P<([^>]+)>", r"(?<\1>", pattern)
    p = re.sub(r"\(\?P=([A-Za-z_][A-Za-z0-9_]*)\)", r"\\k<\1>", p)
    p = re.sub(r"\(\?#[^)]*\)", "", p)
    return p


def java_compile_ok(pattern: str) -> bool | None:
    """Try compiling under java.util.regex via the active session's JVM.
    Returns None when no JVM is reachable (pure-driver contexts)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return None
        spark.sparkContext._jvm.java.util.regex.Pattern.compile(pattern)
        return True
    except Exception:
        return False


def warn_if_nonportable(pattern: str, where: str = "") -> list[str]:
    issues = portability_issues(pattern)
    if issues:
        warnings.warn(
            f"pattern {pattern!r}{f' at {where}' if where else ''} may differ "
            f"between rlike (Java) and re (Python): {'; '.join(issues)}. "
            "Use plans.json_docs.validate_json_exact for CPython-exact semantics.",
            RegexDialectWarning,
            stacklevel=3,
        )
    return issues


def checked_java_pattern(pattern: str, where: str = "") -> "str | None":
    """Shared compile-time gate for every rlike site: returns the translated
    Java pattern, ``None`` when the pattern is invalid under Python ``re``
    (callers mirror the reference: lazy SCHEMA_INVALID for value patterns,
    skip for patternProperties keys), and raises SchemaCompileError when the
    translation has no java.util.regex equivalent — a per-row JVM
    PatternSyntaxException must never be the first signal."""
    import re as _re

    from json_schema_py_spark.schema.model import SchemaCompileError

    try:
        _re.compile(pattern)
    except _re.error:
        return None
    jp = to_java_pattern(pattern)
    leftover = portability_issues(jp)
    if leftover:
        # constructs the translator could NOT handle: genuine dialect risk
        warn_if_nonportable(jp, where)
    elif portability_issues(pattern):
        # handled mechanically (named groups/backrefs, comment groups):
        # inform, but do NOT steer users off the fast Column path
        import warnings as _warnings

        _warnings.warn(
            f"pattern {pattern!r}{f' at {where}' if where else ''} used "
            "Python-only spellings that were mechanically translated to the "
            "java.util.regex dialect; semantics preserved — no action needed.",
            RegexDialectWarning,
            stacklevel=3,
        )
    if java_compile_ok(jp) is False:
        raise SchemaCompileError(
            f"pattern {pattern!r}{f' at {where}' if where else ''} has no "
            "java.util.regex equivalent; validate this ruleset via "
            "plans.json_docs.validate_json_exact (CPython semantics)"
        )
    return jp
