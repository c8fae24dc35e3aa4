"""JS->Java regex dialect translation.

The reference compiles user-supplied patterns as JavaScript ``RegExp`` with
flags ``'ig'`` (include) and ``'i'`` (exclude) — reference
``src/subscription.ts:203-204``. Spark executes Java regex, so flags are
translated to inline ``(?i)`` / ``(?s)`` prefixes and a few common dialect
differences are normalized. Validation happens config-write time
(reference ``src/databaseUtil.ts:17-32``).
"""

from __future__ import annotations

import re

# JS inline flag -> Java embedded flag expression. 'g' (global) has no Java
# equivalent: it changes match *iteration*, not match semantics; the engine
# models it by using regexp_count (match count) rather than boolean rlike.
_FLAG_MAP = {"i": "(?i)", "s": "(?s)", "m": "(?m)", "u": ""}


class RegexValidationError(ValueError):
    """Raised at config-write time for unparseable patterns (P13)."""


def js_to_java(pattern: str, flags: str = "") -> str:
    """Translate a JS regex pattern + flags to a Java regex string.

    Java and JS syntax largely overlap; the meaningful production delta is
    flag placement. Unsupported JS constructs (e.g. ``\\cX`` control
    escapes) are left as-is — they fail loudly at validation time instead.
    """
    prefix = "".join(_FLAG_MAP.get(f, "") for f in flags if f != "g")
    return prefix + pattern


def validate_pattern(pattern: str, flags: str = "") -> str:
    """Validate & translate; raise RegexValidationError on failure.

    Mirrors the reference's fail-fast ``new RegExp`` try/catch
    (``src/databaseUtil.ts:18-32``) but validates against the *executing*
    dialect: the translated pattern must compile under Python's ``re``
    (a close proxy for Java regex for the supported subset).
    """
    translated = js_to_java(pattern, flags)
    try:
        re.compile(translated)
    except re.error as e:
        raise RegexValidationError(f"invalid regex {pattern!r}: {e}") from e
    return translated
