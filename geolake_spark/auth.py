"""User-token auth layer (reference: api/app/auth/backend.py:19-60,
auth/manager.py:10-46, dbmanager User/Role models).

The reference authenticates a ``User-Token`` header of the form
``<user_id>:<api_key>`` against a user table with roles; anonymous callers
get the public scope.  Same semantics here as a library: a ``UserStore``
holds users (seeded programmatically or from the catalog file), and
``authenticate`` resolves a token to the role list the Catalog endpoints
already accept.
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
import uuid
from dataclasses import dataclass, field


class AuthenticationFailed(PermissionError):
    pass


class ImproperUserToken(ValueError):
    pass


def _key_hash(api_key: str) -> str:
    return hashlib.sha256(api_key.encode("utf-8")).hexdigest()


@dataclass
class User:
    user_id: str
    key_hash: str  # sha256 of the api key — plaintext never persists
    contact_name: str = ""
    roles: list[str] = field(default_factory=list)


class UserStore:
    """add_user -> token; authenticate(token) -> roles (scopes).

    Mirrors backend.py's scheme checks: empty and malformed tokens are
    rejected with distinct errors; a wrong key for a known user fails
    authentication; anonymous (no token) resolves to no roles (public-only
    visibility through Catalog._visible)."""

    def __init__(self, store_file: str | None = None):
        self._users: dict[str, User] = {}
        self._store_file = store_file
        if store_file and os.path.exists(store_file):
            with open(store_file) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        if "api_key" in rec:  # pre-round-3 plaintext format
                            rec["key_hash"] = _key_hash(rec.pop("api_key"))
                        u = User(**rec)
                        self._users[u.user_id] = u

    def _flush(self) -> None:
        if not self._store_file:
            return
        tmp = self._store_file + ".tmp"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        with os.fdopen(fd, "w") as f:
            for u in self._users.values():
                f.write(json.dumps(u.__dict__) + "\n")
        os.replace(tmp, self._store_file)

    def add_user(self, contact_name: str = "",
                 roles: list[str] | None = None,
                 user_id: str | None = None) -> str:
        """Create a user; returns the full ``user_id:api_key`` token
        (api_key generated as in dbmanager.generate_key).  An explicit
        ``user_id`` must parse as a UUID; it is CANONICALIZED (lowercase
        dashed ``str(uuid.UUID(...))``) before storage and token minting,
        so braced / undashed / urn: / mixed-case spellings of one UUID
        can never alias into distinct users (parse_token itself accepts
        braced and undashed forms too — without canonical storage the
        same UUID could mint several independently-keyed accounts).  The
        minted token always carries the canonical form, which
        parse_token/authenticate accept for any input spelling."""
        if user_id is not None:
            try:
                # NO version kwarg: uuid.UUID(s, version=4) silently
                # rewrites the version nibble, which would mangle valid
                # v1/v3/v5 ids instead of validating them
                user_id = str(uuid.UUID(user_id))
            except ValueError:
                raise ValueError(
                    f"user_id {user_id!r} must be a UUID "
                    f"(tokens with other ids can never authenticate)")
        uid = user_id or str(uuid.uuid4())
        key = secrets.token_urlsafe(32)
        self._users[uid] = User(user_id=uid, key_hash=_key_hash(key),
                                contact_name=contact_name,
                                roles=list(roles or []))
        self._flush()
        return f"{uid}:{key}"

    @staticmethod
    def parse_token(token: str) -> tuple[str, str]:
        """backend.py get_authorization_scheme_param: exactly one colon;
        auth/manager.py additionally requires the user_id to parse as a
        UUID (malformed ids are rejected before any store lookup)."""
        if token is None or not token.strip():
            raise ImproperUserToken("empty user token")
        parts = token.split(":")
        if len(parts) != 2:
            raise ImproperUserToken("token must be '<user_id>:<api_key>'")
        try:
            uuid.UUID(parts[0], version=4)
        except ValueError:
            raise ImproperUserToken(
                f"user_id {parts[0]!r} is not a valid UUID") from None
        return parts[0], parts[1]

    def authenticate(self, token: str | None) -> list[str]:
        """Token -> role list; None -> anonymous (public scope only).
        Key comparison is constant-time over sha256 digests (no plaintext
        keys in memory-resident store or on disk; no timing side channel),
        and unknown users burn the same compare as known ones."""
        if token is None:
            return []
        user_id, api_key = self.parse_token(token)
        user = self._users.get(user_id)
        expected = user.key_hash if user else _key_hash("")
        ok = secrets.compare_digest(_key_hash(api_key), expected)
        if user is None or not ok:
            raise AuthenticationFailed(f"bad credentials for {user_id!r}")
        return list(user.roles)
