"""Feed-generator record publish/delete — the reference's ops scripts
as engine surface (control plane, no Spark involvement).

The reference ships two operator scripts that write the
``app.bsky.feed.generator`` record to the live PDS:

- ``scripts/publishFeedGen.ts``: login -> optional avatar
  ``uploadBlob`` (encoding from the file extension, png/jpeg only,
  ``:52-60``) -> ``putRecord`` with
  ``{did, displayName, description, avatar?, createdAt}`` at
  ``collection=app.bsky.feed.generator, rkey=recordName``
  (``:66-77``); the service DID defaults to ``did:web:<hostname>`` and
  a missing hostname is a hard error (``:40-44``); the description
  normalizes a literal ``¥n`` to a newline (``:27``).
- ``scripts/deleteFeedGenerator.ts``: login -> ``deleteRecord`` of the
  same (repo=session did, collection, rkey) triple (``:33-39``).

Everything above EXCEPT the network hop is engine logic: record shape,
validation, encoding rules, DID defaulting, op routing.  This module
implements that logic against an injected ``transport`` (the same seam
as the S1 paged fetcher and the S4 firehose stand-in — the sandbox has
no network; a real deployment passes a thin client over
``com.atproto.repo.*``).  The transport contract is four duck-typed
methods::

    login(identifier, password) -> did          # session repo DID
    upload_blob(data: bytes, encoding) -> blob  # returned ref is opaque
    put_record(repo, collection, rkey, record) -> response
    delete_record(repo, collection, rkey) -> response

Beyond reference parity, the avatar payload's MAGIC BYTES are checked
against the declared encoding (the engine ships real PNG/JPEG codecs;
uploading a JPEG renamed ``.png`` would otherwise publish a broken
avatar silently).
"""

from __future__ import annotations

import re
from typing import Any, Optional

FEED_GENERATOR_COLLECTION = "app.bsky.feed.generator"

#: AT-protocol record-key grammar (atproto.com/specs/record-key):
#: 1-512 chars of [A-Za-z0-9._:~-], and not the reserved "." / "..".
_RKEY = re.compile(r"^[A-Za-z0-9._:~-]{1,512}$")

_MAGIC = {
    "image/png": b"\x89PNG\r\n\x1a\n",
    "image/jpeg": b"\xff\xd8\xff",
}


class PublishError(ValueError):
    """Raised for invalid publish/delete inputs (fail fast, before any
    transport call — mirroring the reference's throw-before-putRecord)."""


def _validate_rkey(record_name: str) -> str:
    if not record_name or not _RKEY.fullmatch(record_name) or record_name in (".", ".."):
        raise PublishError(
            f"invalid record name {record_name!r}: must match the AT "
            "record-key grammar [A-Za-z0-9._:~-]{{1,512}}"
        )
    return record_name


def resolve_service_did(
    service_did: Optional[str] = None, hostname: Optional[str] = None
) -> str:
    """The reference's DID defaulting (publishFeedGen.ts:40-44):
    explicit service DID wins; else ``did:web:<hostname>``; neither is
    a hard error."""
    if service_did:
        return service_did
    if hostname:
        return f"did:web:{hostname}"
    raise PublishError("provide a service DID or a hostname")


def avatar_encoding(path: str) -> str:
    """Encoding from the file extension — png/jpeg only, anything else
    refuses (publishFeedGen.ts:52-60).

    Deliberately matches the reference's bare ``endsWith('png')`` — no
    dot required, so ``'foopng'`` maps to image/png (r12 advice:
    documented, kept for byte-for-byte parity).  Safe because the
    publish flow verifies the blob's MAGIC BYTES against the claimed
    encoding before upload; a mislabeled suffix fails there, loudly."""
    low = path.lower()
    if low.endswith("png"):
        return "image/png"
    if low.endswith("jpg") or low.endswith("jpeg"):
        return "image/jpeg"
    raise PublishError(f"expected png or jpeg avatar, got {path!r}")


def build_feed_generator_record(
    service_did: str,
    display_name: str,
    description: str = "",
    avatar_ref: Any = None,
    created_at: str = "1970-01-01T00:00:00.000Z",
) -> dict:
    """The ``app.bsky.feed.generator`` record body
    (publishFeedGen.ts:70-76).  ``¥n`` in the description normalizes to
    a real newline (``:27`` — the reference reads descriptions from
    .env, where literal newlines are awkward).  ``created_at`` is
    injected, not sampled, so record construction is deterministic."""
    record = {
        "did": service_did,
        "displayName": display_name,
        "description": description.replace("¥n", "\n"),
        "avatar": avatar_ref,
        "createdAt": created_at,
    }
    if avatar_ref is None:
        # the reference passes `undefined`, which JSON-serializes away;
        # the Python analog is omission
        del record["avatar"]
    return record


def publish_feed_generator(
    transport,
    identifier: str,
    password: str,
    record_name: str,
    display_name: str,
    description: str = "",
    avatar_path: Optional[str] = None,
    avatar_bytes: Optional[bytes] = None,
    service_did: Optional[str] = None,
    hostname: Optional[str] = None,
    created_at: str = "1970-01-01T00:00:00.000Z",
) -> dict:
    """Publish (upsert) the feed-generator record — the full
    publishFeedGen.ts flow with the network calls routed through
    ``transport``.  Returns ``{"uri", "did", "record", "response"}``.

    ``avatar_bytes`` carries the image payload when ``avatar_path`` is
    set (the reference reads the file itself; here the caller owns IO).
    The payload's magic bytes must match the extension-declared
    encoding — a mislabeled image fails loudly instead of publishing a
    broken avatar.
    """
    _validate_rkey(record_name)
    if not display_name:
        raise PublishError("display_name must be non-empty")
    feed_gen_did = resolve_service_did(service_did, hostname)

    # Avatar input-consistency checks are pure input validation, so they
    # run BEFORE transport.login: PublishError's contract is "fail fast,
    # before any transport call" (ADVICE r13 — the r12 placement still
    # performed a live login on malformed avatar input).
    if avatar_bytes is not None and not avatar_path:
        # review r12: silently dropping a supplied payload would publish
        # WITHOUT the avatar the caller clearly intended to attach
        raise PublishError(
            "avatar_bytes given without avatar_path (the path carries "
            "the encoding; pass both or neither)"
        )
    encoding = None
    if avatar_path:
        if avatar_bytes is None:
            raise PublishError("avatar_path given without avatar_bytes")
        encoding = avatar_encoding(avatar_path)
        if not bytes(avatar_bytes).startswith(_MAGIC[encoding]):
            raise PublishError(
                f"avatar payload does not look like {encoding} (magic "
                "bytes mismatch) — wrong file or wrong extension"
            )

    repo_did = transport.login(identifier, password)
    if not repo_did:
        raise PublishError("transport.login returned no session DID")

    avatar_ref = None
    if avatar_path:
        avatar_ref = transport.upload_blob(bytes(avatar_bytes), encoding)

    record = build_feed_generator_record(
        feed_gen_did, display_name, description, avatar_ref, created_at
    )
    response = transport.put_record(
        repo_did, FEED_GENERATOR_COLLECTION, record_name, record
    )
    return {
        "uri": f"at://{repo_did}/{FEED_GENERATOR_COLLECTION}/{record_name}",
        "did": repo_did,
        "record": record,
        "response": response,
    }


def publish_feed_generator_from_condition(
    transport,
    identifier: str,
    password: str,
    condition,
    avatar_bytes: Optional[bytes] = None,
    service_did: Optional[str] = None,
    hostname: Optional[str] = None,
    created_at: str = "1970-01-01T00:00:00.000Z",
) -> dict:
    """Publish straight from a ``FeedCondition``: the conditions table
    already carries the record name, display name, description, and
    avatar path (``src/db/schema.ts:22-44``), so the ops flow needs no
    second copy of the feed's identity."""
    return publish_feed_generator(
        transport,
        identifier,
        password,
        record_name=condition.recordName,
        display_name=condition.feedName or condition.recordName,
        description=condition.feedDescription or "",
        avatar_path=condition.feedAvatar or None,
        avatar_bytes=avatar_bytes,
        service_did=service_did,
        hostname=hostname,
        created_at=created_at,
    )


def delete_feed_generator(
    transport, identifier: str, password: str, record_name: str
) -> dict:
    """deleteFeedGenerator.ts:33-39 — remove the record at
    (session did, app.bsky.feed.generator, record_name)."""
    _validate_rkey(record_name)
    repo_did = transport.login(identifier, password)
    if not repo_did:
        raise PublishError("transport.login returned no session DID")
    response = transport.delete_record(
        repo_did, FEED_GENERATOR_COLLECTION, record_name
    )
    return {
        "uri": f"at://{repo_did}/{FEED_GENERATOR_COLLECTION}/{record_name}",
        "did": repo_did,
        "response": response,
    }
