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

import json
import os
import secrets
import uuid
from dataclasses import dataclass, field


class AuthenticationFailed(PermissionError):
    pass


class ImproperUserToken(ValueError):
    pass


@dataclass
class User:
    user_id: str
    api_key: str
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
                        u = User(**json.loads(line))
                        self._users[u.user_id] = u

    def _flush(self) -> None:
        if not self._store_file:
            return
        tmp = self._store_file + ".tmp"
        with open(tmp, "w") as f:
            for u in self._users.values():
                f.write(json.dumps(u.__dict__) + "\n")
        os.replace(tmp, self._store_file)

    def add_user(self, contact_name: str = "",
                 roles: list[str] | None = None,
                 user_id: str | None = None) -> str:
        """Create a user; returns the full ``user_id:api_key`` token
        (api_key generated as in dbmanager.generate_key)."""
        uid = user_id or str(uuid.uuid4())
        key = secrets.token_urlsafe(32)
        self._users[uid] = User(user_id=uid, api_key=key,
                                contact_name=contact_name,
                                roles=list(roles or []))
        self._flush()
        return f"{uid}:{key}"

    @staticmethod
    def parse_token(token: str) -> tuple[str, str]:
        """backend.py get_authorization_scheme_param: exactly one colon."""
        if token is None or not token.strip():
            raise ImproperUserToken("empty user token")
        parts = token.split(":")
        if len(parts) != 2:
            raise ImproperUserToken("token must be '<user_id>:<api_key>'")
        return parts[0], parts[1]

    def authenticate(self, token: str | None) -> list[str]:
        """Token -> role list; None -> anonymous (public scope only)."""
        if token is None:
            return []
        user_id, api_key = self.parse_token(token)
        user = self._users.get(user_id)
        if user is None or user.api_key != api_key:
            raise AuthenticationFailed(f"bad credentials for {user_id!r}")
        return list(user.roles)
