"""HTTP/XRPC service shell: the runnable twin of the reference's Express app.

The reference wires four route groups onto one HTTP listener
(``src/server.ts:33-80``):

* ``GET /xrpc/app.bsky.feed.getFeedSkeleton``  (``src/methods/feed-generation.ts:8-38``)
* ``GET /xrpc/app.bsky.feed.describeFeedGenerator`` (``src/methods/describe-generator.ts:5-27``)
* ``GET /.well-known/did.json``                (``src/well-known.ts:7-23``)
* ``POST /setQuery | /getQuery | /deleteCondition`` — the config-admin
  surface (``src/databaseUtil.ts:9-199``), gated by the
  ``x-starrtsky-webpasskey`` header when a passkey is configured.

This module puts a real listening socket in front of the handler functions
that already exist (``serving.FeedServer``, ``auth.did_document``,
``config.FeedCondition.validate``) — stdlib ``http.server`` only, because
the service shell is control-plane plumbing: ALL data-plane work stays in
the Spark plans those handlers build. Requests are served from a thread
pool (``ThreadingHTTPServer``); each getFeedSkeleton request is one tiny
key-pruned top-k plan, so concurrent page fetches parallelize in the JVM
exactly as concurrent Express requests parallelize in the reference.

Error-shape parity:

* unknown feed          -> 400 ``{"error": "UnsupportedAlgorithm"}``
  (XRPC InvalidRequestError, feed-generation.ts:17-22)
* missing/invalid JWT on a private feed -> 401 ``{"error": "AuthRequired"}``
* bad passkey           -> 401 (databaseUtil.ts:13-15)
* validation failure    -> 500 ``{"result": "INPUT_REGEX_ERROR", ...}``
  with the reference's exact result codes (databaseUtil.ts:17-75)
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from . import __version__
from .auth import AuthRequiredError, did_document
from .config import ConditionValidationError, FeedCondition
from .regex_dialect import RegexValidationError, validate_pattern
from .serving import DEFAULT_PAGE_LIMIT, FeedServer, UnknownFeedError

_RECORD_NAME_RE = re.compile(r"^[a-z0-9-]{1,15}$")  # databaseUtil.ts:34
_INT_RE = re.compile(r"^-?\d+$")  # databaseUtil.ts:44 (/^-?\d+$/)

PASSKEY_HEADER = "x-starrtsky-webpasskey"  # databaseUtil.ts:11 (sic)

# request-body caps, reference parity (src/server.ts:48-50): json/text
# 100 KB.  (The reference's 5 MB blobLimit has no analog here — no route
# of this shell accepts blobs.)
JSON_BODY_LIMIT = 100 * 1024


class _PayloadTooLarge(Exception):
    """Content-Length exceeded JSON_BODY_LIMIT (mapped to HTTP 413)."""

    def __init__(self, n: int):
        super().__init__(f"payload of {n} bytes over limit")
        self.n = n


def app_version() -> str:
    """``appVersion()`` analog (src/subscription.ts export)."""
    return f"starryskyqueryengine-spark/{__version__}"


@dataclass
class ServerConfig:
    """``src/config.ts`` subset that the routes actually read."""

    hostname: str = "feed.test"
    service_did: str = "did:web:feed.test"
    publisher_did: str = "did:example:publisher"
    #: EDIT_WEB_PASSKEY analog; None = admin routes open (reference skips
    #: the check when the env var is undefined, databaseUtil.ts:13)
    passkey: Optional[str] = None
    listen_host: str = "127.0.0.1"
    port: int = 0  # 0 = ephemeral


class AtUriError(ValueError):
    pass


def parse_at_uri(uri: str) -> tuple[str, str, str]:
    """``at://authority/collection/rkey`` -> parts (AtUri in the reference,
    feed-generation.ts:9)."""
    if not uri.startswith("at://"):
        raise AtUriError(f"not an at-uri: {uri!r}")
    rest = uri[len("at://"):]
    parts = rest.split("/")
    if len(parts) != 3 or not all(parts):
        raise AtUriError(f"malformed at-uri: {uri!r}")
    return parts[0], parts[1], parts[2]


def _num_like(v) -> bool:
    """JS ``!isNaN(Number(v))`` for the initPost/limitCount gates
    (databaseUtil.ts:49-61): numbers and numeric strings pass, '' passes
    (Number('') is 0), non-numeric strings fail."""
    if v is None or isinstance(v, (int, float)):
        return True
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return True
        try:
            float(s)
            return True
        except ValueError:
            return False
    return False


def validate_set_query(body: dict) -> Optional[tuple[str, str]]:
    """The databaseUtil.ts:17-75 validation gauntlet, same order and same
    result codes. Returns (result_code, message) on failure, None on pass."""
    try:
        if body.get("inputRegex"):
            validate_pattern(str(body["inputRegex"]), "i")
    except RegexValidationError:
        return ("INPUT_REGEX_ERROR", "inputRegex error. Please input valid regex.")
    try:
        if body.get("invertRegex"):
            validate_pattern(str(body["invertRegex"]), "i")
    except RegexValidationError:
        return ("INVERT_REGEX_ERROR", "invertRegex error. Please input valid regex.")
    if not _RECORD_NAME_RE.match(str(body.get("recordName") or "")):
        return (
            "RECORDNAME_NOTALPHA",
            "RecordName should be 15 digit lowercase alphabets.",
        )
    if not _INT_RE.match(str(body.get("refresh", 0))):
        return ("NOT_NUMBER_REFRESH", "Refresh should be an integer.")
    if not _num_like(body.get("initPost", 0)):
        return ("NOT_NUMBER_INITPOST", "Initial post count should be number.")
    if not _num_like(body.get("limitCount", 0)):
        return ("NOT_NUMBER_LIMITCOUNT", "Limit post count should be number.")
    pm = body.get("profileMatch")
    if pm:
        parts = str(pm).split("::")
        try:
            if len(parts) != 2 or not all(parts):
                raise RegexValidationError("profileMatch must be 'term::profileRegex'")
            validate_pattern(parts[0], "i")
            validate_pattern(parts[1], "i")
        except RegexValidationError:
            return (
                "PROFILE_MATCH_REGEX_ERROR",
                "profileMatch error. Please input valid regex.",
            )
    return None


class FeedGeneratorServer:
    """``FeedGenerator`` (src/server.ts:14-80) twin: one HTTP listener over
    the FeedServer read path + the conditions admin surface.

    The constructor takes the already-built world (FeedServer wraps spark,
    registry, store) — ``create + start`` mirrors the reference's
    ``FeedGenerator.create(cfg).start()``.
    """

    def __init__(
        self,
        feed_server: FeedServer,
        cfg: ServerConfig,
        key_lookup=None,
        verifier=None,
    ):
        self.feeds = feed_server
        self.cfg = cfg
        self.key_lookup = key_lookup or (lambda iss: None)
        self.verifier = verifier
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- route handlers (pure: dict in, (status, dict) out) ----------------

    def handle_get_feed_skeleton(self, params: dict, headers: dict) -> tuple[int, dict]:
        feed_uri = params.get("feed")
        if not feed_uri:
            return 400, {"error": "InvalidRequest", "message": "missing feed param"}
        try:
            _did, _collection, rkey = parse_at_uri(feed_uri)
        except AtUriError as e:
            return 400, {"error": "InvalidRequest", "message": str(e)}
        limit = DEFAULT_PAGE_LIMIT
        if params.get("limit"):
            try:
                limit = int(params["limit"])
            except ValueError:
                return 400, {"error": "InvalidRequest", "message": "bad limit"}
        cursor = params.get("cursor")
        try:
            page = self.feeds.get_feed_skeleton_authed(
                rkey,
                headers,
                self.cfg.service_did,
                self.key_lookup,
                limit=limit,
                cursor=cursor,
                verifier=self.verifier,
            )
        except UnknownFeedError:
            # feed-generation.ts:17-22 InvalidRequestError shape
            return 400, {
                "error": "UnsupportedAlgorithm",
                "message": "Unsupported algorithm",
            }
        except AuthRequiredError as e:
            return 401, {"error": "AuthRequired", "message": str(e)}
        except ValueError as e:
            # a malformed client-supplied cursor (parse_cursor raises
            # ValueError) is the CLIENT's error: 400 InvalidRequest,
            # never a 500 from the blanket handler
            return 400, {"error": "InvalidRequest", "message": str(e)}
        body: dict = {"feed": page.feed}
        if page.cursor is not None:
            body["cursor"] = page.cursor
        return 200, body

    def handle_describe_feed_generator(self) -> tuple[int, dict]:
        feeds = self.feeds.describe_feed_generator(self.cfg.publisher_did)
        return 200, {"did": self.cfg.service_did, "feeds": feeds}

    def handle_well_known(self) -> tuple[int, Optional[dict]]:
        doc = did_document(self.cfg.service_did, self.cfg.hostname)
        if doc is None:
            return 404, None
        return 200, doc

    def _passkey_ok(self, headers: dict) -> bool:
        if self.cfg.passkey is None:
            return True  # EDIT_WEB_PASSKEY undefined -> check skipped
        return headers.get(PASSKEY_HEADER) == self.cfg.passkey

    def handle_set_query(self, body: dict, headers: dict) -> tuple[int, Optional[dict]]:
        if not self._passkey_ok(headers):
            return 401, None
        err = validate_set_query(body)
        if err is not None:
            code, message = err
            return 500, {"result": code, "message": message}
        # delete-then-insert upsert (U3, databaseUtil.ts:77-108); recordCount
        # resets to 0 exactly as the reference's insert object does
        try:
            cond = FeedCondition.from_raw({**body, "recordCount": 0})
            prev = self.feeds.registry.get(cond.key)
            if prev is not None:
                # engine-side low-watermark state is NOT part of the
                # admin's edit: the full-replace upsert must carry the
                # init-truncation flag (and catch-up timestamp) forward,
                # or a cosmetic edit would let already-truncated old
                # posts re-enter the feed on the next full replay
                cond.initTruncated = prev.initTruncated
                if "lastExecTime" not in body:
                    cond.lastExecTime = prev.lastExecTime
            self.feeds.registry.upsert(cond)
        except ConditionValidationError as e:
            # fields the gauntlet does not cover (imageOnly, list lang,
            # negative caps) still fail with the documented result-code
            # shape, not an opaque 500
            return 500, {"result": "INVALID_PARAMETER", "message": str(e)}
        return 200, {"result": "OK", "message": "Update succeeded"}

    def handle_get_query(self, body: dict, headers: dict) -> tuple[int, Optional[dict]]:
        if not self._passkey_ok(headers):
            return 401, None
        cond = self.feeds.registry.get(str(body.get("key")))
        if cond is None:
            return 200, {
                "result": "NOT_FOUND",
                "message": f"Specified key not found. {body.get('key')}",
                "queryEngineVersion": app_version(),
            }
        out = {
            "result": "OK",
            "key": cond.key,
            "recordName": cond.recordName,
            "query": cond.query,
            "inputRegex": cond.inputRegex,
            "invertRegex": cond.invertRegex,
            "refresh": cond.refresh,
            "lang": cond.lang,
            "labelDisable": cond.labelDisable,
            "replyDisable": cond.replyDisable,
            "imageOnly": cond.imageOnly,
            "includeAltText": cond.includeAltText,
            "initPost": cond.initPost,
            "pinnedPost": ",".join(cond.pinnedPost),
            "lastExecTime": cond.lastExecTime,
            "feedAvatar": cond.feedAvatar,
            "feedName": cond.feedName,
            "feedDescription": cond.feedDescription,
            "privateFeed": ",".join(cond.privateFeed),
            "limitCount": cond.limitCount,
            "recordCount": cond.recordCount,
            "profileMatch": cond.profileMatch,
            "queryEngineVersion": app_version(),
        }
        return 200, out

    def handle_delete_condition(self, body: dict, headers: dict) -> tuple[int, Optional[dict]]:
        # NOTE reference quirk preserved: databaseUtil.ts:163-199 sends
        # {result: 'OK'} even when the passkey check failed the deletes —
        # only the mutations are gated, the response is not. We keep the
        # mutation gate and also return the honest 401 (documented
        # deviation: silently claiming OK on an unauthorized delete is a
        # footgun, and no client depends on it).
        if not self._passkey_ok(headers):
            return 401, None
        key = str(body.get("key"))
        # U4 cascade: condition row + all posts of the key
        self.feeds.registry.delete(key)
        self.feeds.store.delete_key(key)
        return 200, {"result": "OK"}

    # -- socket plumbing ---------------------------------------------------

    def start(self) -> int:
        """Bind + serve on a daemon thread; returns the bound port."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            server_version = "ssqe-spark"

            def log_message(self, fmt, *args):  # quiet test output
                pass

            def _send_json(self, status: int, payload: Optional[dict]) -> None:
                if payload is None:
                    self.send_response(status)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                raw = json.dumps(payload).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def _headers(self) -> dict:
                return {k.lower(): v for k, v in self.headers.items()}

            def do_GET(self):
                url = urlparse(self.path)
                params = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    if url.path == "/xrpc/app.bsky.feed.getFeedSkeleton":
                        status, body = outer.handle_get_feed_skeleton(
                            params, self._headers()
                        )
                    elif url.path == "/xrpc/app.bsky.feed.describeFeedGenerator":
                        status, body = outer.handle_describe_feed_generator()
                    elif url.path == "/.well-known/did.json":
                        status, body = outer.handle_well_known()
                    else:
                        status, body = 404, {"error": "NotFound"}
                except Exception as e:  # XRPC InternalServerError shape
                    status, body = 500, {"error": "InternalServerError",
                                         "message": str(e)}
                self._send_json(status, body)

            def _read_body(self) -> dict:
                # reference parity (src/server.ts:48-50): json/text
                # bodies are capped at 100 KB — an unbounded read lets
                # one request buffer arbitrary bytes driver-side.  The
                # cap is checked BEFORE reading, so oversized bodies
                # cost a header parse, not a 100 MB recv.
                # clamp negatives (review r10): a crafted negative
                # Content-Length passed the cap check and reached
                # rfile.read(n < 0), which reads until EOF — the request
                # thread hung for as long as a keep-alive client cared
                # to stay silent
                n = max(0, int(self.headers.get("Content-Length") or 0))
                if n > JSON_BODY_LIMIT:
                    raise _PayloadTooLarge(n)
                raw = self.rfile.read(n) if n else b""
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/x-www-form-urlencoded":
                    return {k: v[0] for k, v in parse_qs(raw.decode("utf-8")).items()}
                if not raw:
                    return {}
                try:
                    return json.loads(raw.decode("utf-8"))
                except json.JSONDecodeError:
                    return {}

            def do_POST(self):
                url = urlparse(self.path)
                try:
                    try:
                        body_in = self._read_body()
                    except _PayloadTooLarge as e:
                        # 413 without draining: close the connection so
                        # the unread body never buffers server-side
                        self.close_connection = True
                        self._send_json(
                            413,
                            {"error": "PayloadTooLarge",
                             "message": f"body of {e.n} bytes exceeds "
                                        f"the {JSON_BODY_LIMIT}-byte limit"},
                        )
                        return
                    if url.path == "/setQuery":
                        status, body = outer.handle_set_query(body_in, self._headers())
                    elif url.path == "/getQuery":
                        status, body = outer.handle_get_query(body_in, self._headers())
                    elif url.path == "/deleteCondition":
                        status, body = outer.handle_delete_condition(
                            body_in, self._headers()
                        )
                    else:
                        status, body = 404, {"error": "NotFound"}
                except Exception as e:
                    status, body = 500, {"error": "InternalServerError",
                                         "message": str(e)}
                self._send_json(status, body)

        self._httpd = ThreadingHTTPServer(
            (self.cfg.listen_host, self.cfg.port), Handler
        )
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "FeedGeneratorServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]
