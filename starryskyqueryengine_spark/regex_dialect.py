"""JS->Java regex dialect translation.

The reference compiles user-supplied patterns as JavaScript ``RegExp`` with
flags ``'ig'`` (include) and ``'i'`` (exclude) — reference
``src/subscription.ts:203-204``. Spark executes Java regex, so flags are
translated to inline ``(?iu)`` / ``(?s)`` prefixes and a few common dialect
differences are normalized. Validation happens config-write time
(reference ``src/databaseUtil.ts:17-32``).
"""

from __future__ import annotations

import re

# JS inline flag -> Java embedded flag expression.
# - 'i' maps to (?iu), NOT (?i): JS case-insensitivity canonicalizes via
#   Unicode toUpperCase (ECMA-262), while Java's bare CASE_INSENSITIVE is
#   US-ASCII-only — '(?i)ärger' would silently not match 'ÄRGER'.
#   UNICODE_CASE ((?u)) restores the reference's matching.
# - 'g' (global) has no Java equivalent: it changes match *iteration*,
#   not match semantics; the engine models it by using regexp_count
#   (match count) rather than boolean rlike.
# - 'u' (unicode) is a deliberate no-op: Java regex is UTF-16-native.
# - 'm' emits NO Java flag (r11): Java MULTILINE terminators include
#   U+0085 (NEL) and treat \r\n as one unit, while JS LineTerminator
#   is exactly [\n \r U+2028 U+2029] with \r\n as two — so (?m) anchors
#   diverged on both.  The anchors are now rewritten token-level to
#   lookarounds over the exact JS terminator set (see _rewrite_tokens).
# Flags OUTSIDE this map (e.g. 'y' sticky, 'd' indices, 'v') change
# matching semantics in ways the engine cannot reproduce — they raise at
# validation instead of being silently dropped.
_FLAG_MAP = {"i": "(?iu)", "s": "(?s)", "m": "", "u": "", "g": ""}

# ECMA-262 WhiteSpace ∪ LineTerminator — what JS ``\s`` matches.  Java's
# ``\s`` is US-ASCII ([ \t\n\x0B\f\r]) unless UNICODE_CHARACTER_CLASS is
# on, and (?U) is NOT an option here: it also widens \w/\b/\d, changing
# semantics the reference never had.  So ``\s``/``\S`` are rewritten to
# this explicit class instead (NBSP and friends are common in
# copy-pasted web text — the exact rows a feed regex runs against).
_JS_WS = (
    "\\t\\n\\x0B\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
)


class RegexValidationError(ValueError):
    """Raised at config-write time for unparseable patterns (P13)."""


# ECMA-262 LineTerminator, exactly: LF CR LS PS.  Java's line-terminator
# set adds U+0085 (NEL) and treats \r\n as a unit — the set behind the
# ``.``/``^``/``$`` rewrites below.
_JS_TERM = "\\n\\r\\u2028\\u2029"


def _rewrite_tokens(pattern: str, multiline: bool, dotall: bool = False) -> str:
    """Token-level JS->Java rewrites that need escape/class awareness:

    - ``\\s``/``\\S`` -> the explicit ECMA whitespace class (Java's are
      ASCII-only; see _JS_WS).  Inside a character class the set splices
      in bracket-free; ``\\S`` inside a class becomes a nested negated
      class (a Java char-class union — Java-legal, and validation only
      needs Python ``re`` to *compile* the translated form).
    - unflagged ``$`` -> ``\\z``: JS ``$`` (no ``m``) matches ONLY at the
      true end of input, Java's also matches before a trailing line
      terminator — 'keyword$' must not match 'keyword\\n'.
    - ``m``-flag anchors -> lookarounds over the exact JS terminator set
      (r11, found by the Hypothesis dialect suite): Java MULTILINE
      terminators include U+0085 (NEL) and treat \\r\\n as one unit, JS
      LineTerminator is exactly [\\n\\r LS PS] with \\r\\n as two — so
      ``(?m)^a`` missed the match after '\\r' in '\\r\\n' and ``(?m)a$``
      spuriously matched before NEL.  ``^`` -> ``(?:\\A|(?<=[term]))``,
      ``$`` -> ``(?:\\z|(?=[term]))`` reproduce JS exactly; no (?m) flag
      is emitted at all.
    - unflagged ``.`` -> ``[^\\n\\r LS PS]`` (r11, same suite): JS ``.``
      excludes ONLY LineTerminator — it MATCHES NEL — while Java ``.``
      excludes NEL too, so ``a.b`` silently missed 'a\\u0085b' (NEL is
      real in copy-pasted web text).  Under ``s`` (dotAll) both dialects'
      dots match everything, so ``.`` passes through and the (?s) prefix
      applies.
    - JS empty-class idioms (r10): ``[^]`` (any char INCLUDING line
      terminators — the JS idiom for dot-with-newlines) -> ``(?s:.)``;
      ``[]`` (matches nothing) -> ``(?!)``.  Both are Java SYNTAX
      ERRORS, so a migrating feed author's pattern was rejected at
      validation instead of matching like the reference.  JS closes a
      class at a ``]`` in first position (ECMA-262 ClassRanges can be
      empty — unlike POSIX's literal-] rule), so consuming exactly
      ``[]``/``[^]`` is the JS parse.  Quantified forms keep JS
      semantics in Java (verified against live java.util.regex):
      ``(?!)*`` matches empty exactly like ``[]*``, ``(?!)+`` always
      fails like ``[]+``.

    - in-class ``[`` and ``&`` -> escaped (r14): ECMA-262 ClassAtom
      excludes only ``\\`` and ``]``, so JS reads both as literals,
      while Java reads ``[`` as a nested-class opener (usually an
      unclosed-class error — a valid JS pattern like ``[a[b]`` was
      loudly REJECTED at validation) and ``&&`` as class intersection
      (``[a&&b]`` compiles cleanly and silently matches NOTHING — the
      one divergence the JVM compile check cannot catch).

    Escaped escapes (``\\\\s``) and class-literal ``$``/``.``/``^`` are
    left alone by construction: the walker consumes backslash pairs
    atomically and tracks in-class state.
    """
    out: list[str] = []
    i, in_class = 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            if nxt == "s":
                out.append(_JS_WS if in_class else "[" + _JS_WS + "]")
            elif nxt == "S":
                out.append("[^" + _JS_WS + "]")
            else:
                out.append(ch + nxt)
            i += 2
            continue
        if ch == "[" and not in_class:
            if pattern.startswith("[^]", i):
                out.append("(?s:.)")  # JS any-char (incl. terminators)
                i += 3
                continue
            if pattern.startswith("[]", i):
                out.append("(?!)")  # JS empty class: matches nothing
                i += 2
                continue
            in_class = True
            out.append(ch)
        elif ch == "[" and in_class:
            # JS: '[' is an ordinary ClassAtom (ECMA-262 excludes only
            # '\' and ']'), so /[a[b]/ matches 'a', '[', 'b'.  Java:
            # '[' in a class opens a NESTED class (union syntax) —
            # usually an unclosed-class compile error that loudly
            # rejected a valid JS pattern at validation (r14).  Escape
            # to pin the JS parse; '\[' is a literal in both dialects.
            out.append("\\[")
        elif ch == "&" and in_class:
            # JS: literal '&'.  Java: '&&' inside a class is
            # INTERSECTION — '[a&&b]' compiles cleanly and silently
            # matches NOTHING (r14; the one in-class divergence the
            # fail-fast JVM compile check cannot catch).  '\&' is a
            # literal in both dialects, and escaping every in-class
            # '&' reproduces JS for single '&' and '&&' alike.
            out.append("\\&")
        elif ch == "]" and in_class:
            in_class = False
            out.append(ch)
        elif ch == "$" and not in_class:
            out.append("(?:\\z|(?=[" + _JS_TERM + "]))" if multiline else r"\z")
        elif ch == "^" and not in_class and multiline:
            out.append("(?:\\A|(?<=[" + _JS_TERM + "]))")
        elif ch == "." and not in_class and not dotall:
            out.append("[^" + _JS_TERM + "]")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def js_to_java(pattern: str, flags: str = "") -> str:
    """Translate a JS regex pattern + flags to a Java regex string.

    Java and JS syntax largely overlap; the production deltas handled
    here are flag placement, the Unicode width of ``\\s``/``\\S``, and
    the end-anchor semantics of ``$`` (see ``_rewrite_tokens``).
    Unsupported JS constructs (e.g. ``\\cX`` control escapes) are left
    as-is — they fail loudly at validation time instead. Raises
    RegexValidationError for flags whose semantics the engine cannot
    reproduce ('y' sticky, 'd', 'v', ...).
    """
    for f in flags:
        if f not in _FLAG_MAP:
            raise RegexValidationError(
                f"unsupported regex flag {f!r} (of {flags!r}): its "
                f"matching semantics have no Java/Spark equivalent"
            )
    prefix = "".join(_FLAG_MAP[f] for f in flags)
    return prefix + _rewrite_tokens(
        pattern, multiline="m" in flags, dotall="s" in flags
    )


def _java_compile_check(translated: str) -> None:
    """Compile against the EXECUTING dialect (java.util.regex) when a
    live SparkSession's JVM is reachable.  Python ``re`` is only a
    proxy: JS/Python accept patterns Java rejects (``a{`` bare brace,
    ``[a[b]`` nested class start) — without this check those passed
    config-write validation and then blew up every executor task at
    query time, defeating the fail-fast contract."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return
        jvm = spark.sparkContext._jvm
    except Exception:
        return  # no JVM reachable (pure-Python context): re check stands
    try:
        jvm.java.util.regex.Pattern.compile(translated)
    except Exception as e:
        msg = str(getattr(e, "java_exception", e))
        raise RegexValidationError(
            f"invalid regex for the Java dialect: {msg}"
        ) from None


def validate_pattern(pattern: str, flags: str = "") -> str:
    """Validate & translate; raise RegexValidationError on failure.

    Mirrors the reference's fail-fast ``new RegExp`` try/catch
    (``src/databaseUtil.ts:18-32``) but validates against the *executing*
    dialect: the translated pattern must compile under Python's ``re``
    AND — whenever a live Spark JVM is available — under
    ``java.util.regex``, the engine that will actually run it.
    """
    translated = js_to_java(pattern, flags)
    try:
        # Python's dialect calls Java's \z anchor \Z — swap it for the
        # PROXY compile only (the returned pattern keeps \z; execution
        # is java.util.regex).  A literal '\\z' in the pattern maps to
        # '\\Z' here, which still compiles — only compilability matters.
        re.compile(translated.replace("\\z", "\\Z"))
    except re.error as e:
        raise RegexValidationError(f"invalid regex {pattern!r}: {e}") from e
    _java_compile_check(translated)
    return translated
