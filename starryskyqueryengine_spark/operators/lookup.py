"""Broadcast profile lookup join (S3/J1).

The reference hand-rolls a lookup cache: batches of <=25 author DIDs are
fetched from ``getProfiles`` and memoized in a Map, probed per post
(``src/subscription.ts:241-268,336``). A Spark broadcast hash join
subsumes the batching AND the memoization: the profiles dim ships once to
every executor and probes are O(1) hash lookups inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_author_profiles(
    posts: DataFrame,
    profiles: DataFrame,
    post_did_col: str = "author_did",
    profile_did_col: str = "did",
) -> DataFrame:
    """Left-join author profile text onto posts via broadcast hash join.

    Adds ``author_profile_text`` = displayName + ' ' + description,
    mirroring the reference's cached string
    (``src/subscription.ts:262-266``).
    """
    # one row per did, DETERMINISTICALLY: a duplicate profile row
    # (re-fetched/updated profile appended to the dim) would otherwise
    # MULTIPLY every post by that author through the join — and an
    # arbitrary-winner dropDuplicates would make profileMatch decisions
    # flip run-to-run; the reference's Map memoization structurally
    # holds one entry per did
    from .dedup import dedup_within_batch

    profiles = dedup_within_batch(profiles, [profile_did_col])
    prof = profiles.select(
        F.col(profile_did_col).alias("__did"),
        F.concat_ws(
            " ",
            F.coalesce(F.col("displayName"), F.lit("")),
            F.coalesce(F.col("description"), F.lit("")),
        ).alias("author_profile_text"),
    )
    return posts.join(
        F.broadcast(prof), posts[post_did_col] == prof["__did"], "left"
    ).drop("__did")
