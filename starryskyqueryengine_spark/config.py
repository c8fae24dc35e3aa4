"""Conditions-as-data: the per-feed query definition table.

The reference drives everything off a ``conditions`` row per feed
(``src/db/schema.ts:22-44``); config writes go through a validation
gauntlet (``src/databaseUtil.ts:17-75``) and an upsert
(``src/databaseUtil.ts:77-108``). Here a condition is a dataclass that
normalizes the reference's stringly typed storage (string booleans,
CSV / ``::`` packed lists) into proper types, then compiles to a Spark
``Column`` predicate (see predicate.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, fields

from pyspark.sql import DataFrame, SparkSession

from .regex_dialect import RegexValidationError, validate_pattern
from .schemas import CONDITIONS_SCHEMA

# Defaults mirror the reference's restore-time coalescing
# (src/subscription.ts:73-93): '' for strings, 0/100/2000 for ints.
_RECORD_NAME_RE = re.compile(r"^[a-z0-9-]{1,15}$")  # src/databaseUtil.ts:34-41


class ConditionValidationError(ValueError):
    """Raised for config rows that fail the P13 validation gauntlet."""


@dataclass
class FeedCondition:
    key: str
    recordName: str
    query: str = ""
    inputRegex: str = ""
    invertRegex: str = ""
    refresh: int = 0
    lang: str = ""
    labelDisable: bool = False
    replyDisable: bool = False
    imageOnly: str = ""  # '' | 'imageOnly' | 'textOnly'
    includeAltText: bool = False
    initPost: int = 100  # src/subscription.ts:84
    pinnedPost: list[str] = field(default_factory=list)
    lastExecTime: int = 0
    feedName: str = ""
    feedDescription: str = ""
    limitCount: int = 2000  # src/subscription.ts:86
    privateFeed: list[str] = field(default_factory=list)
    feedAvatar: str = ""
    profileMatch: str = ""  # 'term::profileRegex'
    recordCount: int = 0
    # set by IngestJob when the first (init-mode) run truncated to
    # initPost — the truncation point then acts as a permanent low
    # watermark for the key (reference analog: the newest-first delta
    # scan never reaches below its catch-up stop point,
    # src/subscription.ts:274-278)
    initTruncated: bool = False

    def __post_init__(self) -> None:
        # The reference stores these as comma-separated strings
        # (src/algos/starrysky.ts:34,44); accept either form so a
        # stringly-constructed condition doesn't iterate characters.
        for name in ("pinnedPost", "privateFeed"):
            v = getattr(self, name)
            if isinstance(v, str):
                setattr(self, name, [p for p in v.split(",") if p])

    def validate(self) -> "FeedCondition":
        """Fail-fast validation + canonicalization (P13,
        src/databaseUtil.ts:17-75).  Falsy initPost/limitCount
        canonicalize to the reference's use-time defaults here (its
        ``record.initPost || 100`` / ``limitCount || 2000``,
        src/subscription.ts:84-86): an initPost=0 reaching ingest made
        the init-rank filter drop every post for the key forever, and a
        limitCount=0 meant "no cap" live but 2000 after a save/load
        round trip — canonicalizing at the write gauntlet makes the
        stored and live values identical."""
        if not self.key or not isinstance(self.key, str):
            # '' round-trips through partitioned parquet as
            # __HIVE_DEFAULT_PARTITION__ -> NULL, so posts stored for an
            # empty key could never be served; None crashes far away at
            # to_df against the non-nullable schema field
            raise ConditionValidationError(
                f"key must be a non-empty string, got {self.key!r}"
            )
        # fullmatch, not match-with-$: Python's $ also matches before a
        # trailing newline, so 'feed-a\n' passed and then broke both the
        # emitted AT-URI and by_record_name lookups
        if not _RECORD_NAME_RE.fullmatch(self.recordName):
            raise ConditionValidationError(
                f"recordName {self.recordName!r} must match ^[a-z0-9-]{{1,15}}$"
            )
        if self.inputRegex:
            validate_pattern(self.inputRegex, "ig")
        if self.invertRegex:
            validate_pattern(self.invertRegex, "i")
        if self.profileMatch:
            parts = self.profileMatch.split("::")
            if len(parts) != 2 or not all(parts):
                raise ConditionValidationError(
                    f"profileMatch {self.profileMatch!r} must be 'term::profileRegex'"
                )
            validate_pattern(parts[0], "ig")
            validate_pattern(parts[1], "i")
        for name in ("refresh", "initPost", "limitCount"):
            v = getattr(self, name)
            if not isinstance(v, int):
                raise ConditionValidationError(f"{name} must be an integer, got {v!r}")
        for name in ("initPost", "limitCount"):
            # a negative cap is nonsense the pipeline would act on
            # silently: limitCount=-1 made retention's keep-set empty
            # (a no-op rewrite under the dynamic-overwrite blind spot)
            # while wrongly arming the ingest low-watermark floor
            if getattr(self, name) < 0:
                raise ConditionValidationError(
                    f"{name} must be >= 0, got {getattr(self, name)}"
                )
        # `lang` is a single language code in the reference (appended to the
        # search query as `lang:xx`, src/subscription.ts:220-221). A list here
        # would otherwise surface as an opaque Catalyst type error at ingest.
        if not isinstance(self.lang, str):
            raise ConditionValidationError(
                f"lang must be a single language-code string, got {self.lang!r}"
            )
        if self.imageOnly not in ("", "imageOnly", "textOnly"):
            raise ConditionValidationError(f"bad imageOnly {self.imageOnly!r}")
        # canonicalize the reference's use-time falsy coalescing (see
        # docstring) — after this, the live object, the saved parquet,
        # and a from_raw round trip all agree
        if not self.initPost:
            self.initPost = 100
        if not self.limitCount:
            self.limitCount = 2000
        return self

    @classmethod
    def from_raw(cls, raw: dict) -> "FeedCondition":
        """Build from a reference-shaped stringly dict (restore path S7).

        Applies the reference's defaulting (``|| ''``, ``|| 0``, ``|| 100``,
        ``|| 2000`` — src/subscription.ts:73-93) and unpacks string
        booleans and CSV lists.
        """
        def s(k, d=""):
            return raw.get(k) or d

        def i(k, d):
            # mirror the reference's FALSY coalescing exactly
            # (`Number(v) || 100`): 0 takes the default — an explicit
            # initPost=0 previously survived and made ingest's init-rank
            # filter drop EVERY post for the key forever — and so does
            # non-numeric input (JS Number(':') is NaN, NaN || 100 is
            # 100), keeping S7 restore total over messy stored rows.
            # Numeric float strings parse JS-Number-style and truncate
            # ('12.5' -> 12, the count the engine can honor) instead of
            # being silently swapped for the default.
            v = raw.get(k)
            if v in (None, ""):
                return d
            try:
                n = int(float(v))
            except (TypeError, ValueError, OverflowError):
                # OverflowError too: refresh='Infinity' is legal in the
                # reference (Number('Infinity') || 0 keeps it) but
                # int(float('inf')) raises — a single such row must not
                # abort the whole S7 restore
                return d
            return n if n else d

        def csv(k):
            v = raw.get(k) or ""
            if isinstance(v, list):
                return v
            return [p for p in str(v).split(",") if p]

        return cls(
            key=s("key"),
            recordName=s("recordName"),
            query=s("query"),
            inputRegex=s("inputRegex"),
            invertRegex=s("invertRegex"),
            refresh=i("refresh", 0),
            lang=s("lang"),
            labelDisable=str(raw.get("labelDisable", "")).lower() == "true",
            replyDisable=str(raw.get("replyDisable", "")).lower() == "true",
            imageOnly=s("imageOnly"),
            includeAltText=str(raw.get("includeAltText", "")).lower() == "true",
            initPost=i("initPost", 100),
            pinnedPost=csv("pinnedPost"),
            lastExecTime=i("lastExecTime", 0),
            feedName=s("feedName"),
            feedDescription=s("feedDescription"),
            limitCount=i("limitCount", 2000),
            privateFeed=csv("privateFeed"),
            feedAvatar=s("feedAvatar"),
            profileMatch=s("profileMatch"),
            recordCount=i("recordCount", 0),
            # accepts bool (parquet restore) and the stringly 'true'
            # (reference-shaped dicts); missing -> False
            initTruncated=raw.get("initTruncated") is True
            or str(raw.get("initTruncated", "")).lower() == "true",
        )

    def profile_match_parts(self) -> tuple[str, str] | None:
        if not self.profileMatch:
            return None
        term, prof = self.profileMatch.split("::", 1)
        return term, prof


def conditions_df(spark: SparkSession, conditions: list[FeedCondition]) -> DataFrame:
    """Materialize conditions as a small dim DataFrame (broadcast side)."""
    rows = []
    for c in conditions:
        rows.append(tuple(getattr(c, f.name) for f in fields(c)))
    return spark.createDataFrame(rows, CONDITIONS_SCHEMA)


class ConditionsRegistry:
    """In-memory registry with the reference's CRUD semantics.

    - upsert = delete-then-insert full replace (U3, src/databaseUtil.ts:77-108)
    - delete cascades to the post store (U4, src/databaseUtil.ts:177-186)
      — cascade handled by the caller that owns the store.
    """

    def __init__(self) -> None:
        self._by_key: dict[str, FeedCondition] = {}

    def upsert(self, cond: FeedCondition) -> None:
        self._by_key[cond.key] = cond.validate()

    def restore(self, raw_rows: list[dict]) -> None:
        """S7 config-restore: insert-if-absent (src/subscription.ts:95-99).

        TOTAL over messy stored rows (the from_raw contract): a row that
        fails validation — e.g. a historically-stored regex the stricter
        Java-dialect check now rejects — is logged and SKIPPED, never
        allowed to abort the remaining rows; and a row whose key is
        already present skips validation entirely (it would be ignored
        anyway — eager setdefault used to let such a row kill the whole
        restore)."""
        import logging

        for raw in raw_rows:
            c = FeedCondition.from_raw(raw)
            if c.key in self._by_key:
                continue
            try:
                self._by_key[c.key] = c.validate()
            except ValueError as e:  # Condition- or RegexValidationError
                logging.getLogger(__name__).warning(
                    "restore: skipping condition %r: %s", c.key, e
                )

    def delete(self, key: str) -> FeedCondition | None:
        return self._by_key.pop(key, None)

    def get(self, key: str) -> FeedCondition | None:
        return self._by_key.get(key)

    def by_record_name(self, record_name: str) -> FeedCondition | None:
        for c in self._by_key.values():
            if c.recordName == record_name:
                return c
        return None

    def all(self) -> list[FeedCondition]:
        return list(self._by_key.values())

    def to_df(self, spark: SparkSession) -> DataFrame:
        return conditions_df(spark, self.all())

    # -- durability (the reference's conditions table is a SQLite table;
    #    here: a single-partition parquet dim table) ----------------------

    def save(self, spark: SparkSession, path: str) -> None:
        """Persist the registry; small dim table, one file (coalesce(1))
        so restores never pay a multi-file listing.

        ATOMIC via write-new-then-swap: a bare mode('overwrite') deletes
        the target before writing, so a crash mid-save destroyed the
        only copy of the conditions registry (the reference's SQLite
        table never had that window).  Here the new copy lands in a temp
        dir, the old one steps aside, and the swap is two renames — a
        crash leaves either the old or the new registry readable
        (load() falls back to the stepped-aside copy).

        The stepped-aside copy is only displaced when a primary exists
        (review r14): a save running AFTER a between-renames crash (no
        primary, ``._old`` is the sole copy) used to rmtree that sole
        copy before the new primary landed, so a second crash in that
        window left NOTHING readable.  Now ``._old`` survives until the
        rename of the fresh primary has succeeded."""
        import os
        import shutil

        tmp, old = path + "._tmp", path + "._old"
        shutil.rmtree(tmp, ignore_errors=True)
        self.to_df(spark).coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "ConditionsRegistry":
        """Restore a saved registry (arrays come back as Spark arrays;
        row -> FeedCondition via the permissive from_raw path).  When the
        primary dir is missing but the save-swap's stepped-aside copy
        exists (crash between the two renames), load that.

        TOTAL like :meth:`restore` (review r14): rows go through the
        same skip-and-log path, not a raising upsert — a registry saved
        under an older regex dialect (the JS->Java translator has
        TIGHTENED across rounds) would otherwise abort the whole load
        on its first now-rejected pattern, losing every other feed's
        condition with it.  The reference's SQLite restore never aborts
        on one bad row; neither do we."""
        import os

        if not os.path.exists(path) and os.path.exists(path + "._old"):
            path = path + "._old"
        reg = cls()
        reg.restore([row.asDict() for row in spark.read.parquet(path).collect()])
        return reg
