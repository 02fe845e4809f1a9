"""User-token auth (reference auth/backend.py:19-60 semantics)."""

import pytest

from geolake_spark.auth import (AuthenticationFailed, ImproperUserToken,
                                UserStore)


def test_token_roundtrip_and_roles(tmp_path):
    store = UserStore(str(tmp_path / "users.jsonl"))
    token = store.add_user("alice", roles=["internal"])
    assert store.authenticate(token) == ["internal"]
    # persisted store resolves the same token
    again = UserStore(str(tmp_path / "users.jsonl"))
    assert again.authenticate(token) == ["internal"]


def test_anonymous_is_public_only():
    assert UserStore().authenticate(None) == []


def test_bad_tokens():
    import uuid
    store = UserStore()
    token = store.add_user("bob", roles=["admin"])
    uid = token.split(":")[0]
    with pytest.raises(AuthenticationFailed):
        store.authenticate(f"{uid}:wrong-key")
    with pytest.raises(AuthenticationFailed):  # unknown but well-formed user
        store.authenticate(f"{uuid.uuid4()}:key")
    with pytest.raises(ImproperUserToken):  # reference rejects non-UUID ids
        store.authenticate("nobody:key")
    with pytest.raises(ImproperUserToken):
        store.authenticate("no-colon-token")
    with pytest.raises(ImproperUserToken):
        store.authenticate("a:b:c")
    with pytest.raises(ImproperUserToken):
        store.authenticate("  ")


def test_keys_hashed_at_rest(tmp_path):
    """The persisted store holds sha256 digests, never the api key; file
    mode is owner-only.  Pre-round-3 plaintext records still load."""
    import json
    import os
    path = tmp_path / "users.jsonl"
    store = UserStore(str(path))
    token = store.add_user("alice", roles=["internal"])
    key = token.split(":", 1)[1]
    raw = path.read_text()
    assert key not in raw and '"key_hash"' in raw
    assert (os.stat(path).st_mode & 0o777) == 0o600
    # legacy plaintext record migrates on load
    import uuid
    legacy_uid = str(uuid.uuid4())
    with open(path, "a") as f:
        f.write(json.dumps({"user_id": legacy_uid, "api_key": "old-key",
                            "contact_name": "", "roles": ["admin"]}) + "\n")
    again = UserStore(str(path))
    assert again.authenticate(f"{legacy_uid}:old-key") == ["admin"]
    assert again.authenticate(token) == ["internal"]


def test_auth_gates_catalog_visibility(spark, synth_paths):
    from geolake_spark.api import Catalog, Dataset, Product
    cat = Catalog(spark)
    ds = Dataset("secret", role="internal")
    ds.products["pages"] = Product(
        "pages", lambda s: s.read.parquet(synth_paths["pages"]))
    cat.register(ds)
    store = UserStore()
    insider = store.add_user("carol", roles=["internal"])
    outsider = store.add_user("dave", roles=[])
    assert cat.list_datasets(roles=store.authenticate(insider)) == ["secret"]
    assert cat.list_datasets(roles=store.authenticate(outsider)) == []
    assert cat.list_datasets(roles=store.authenticate(None)) == []


def test_add_user_rejects_non_uuid_id():
    """parse_token only accepts UUID user ids, so add_user minting a token
    for a non-UUID id would produce credentials that can never
    authenticate — reject at creation instead (round-4 ADVICE fix)."""
    import uuid

    import pytest

    from geolake_spark.auth import UserStore
    store = UserStore()
    with pytest.raises(ValueError, match="UUID"):
        store.add_user("alice", user_id="alice")
    # explicit UUID ids still work end-to-end
    uid = str(uuid.uuid4())
    token = store.add_user("alice", roles=["internal"], user_id=uid)
    assert token.startswith(uid + ":")
    assert store.authenticate(token) == ["internal"]


def test_add_user_canonicalizes_uuid_forms():
    """Every spelling uuid.UUID() parses (urn:/braced/undashed/uppercase)
    is accepted and stored canonically, so one UUID can never alias into
    multiple independently-keyed users, and the minted token always
    carries the canonical dashed form (round-5 ADVICE fix: rejecting
    these forms was a silent behavior break — braced/undashed tokens DID
    authenticate before)."""
    from geolake_spark.auth import UserStore
    canon = "12345678-1234-4678-9234-567812345678"
    for spelling in (f"urn:uuid:{canon}",
                     "{" + canon + "}",
                     canon.replace("-", ""),
                     canon.upper()):
        store = UserStore()
        token = store.add_user("x", roles=["r"], user_id=spelling)
        assert token.startswith(canon + ":")
        assert store.authenticate(token) == ["r"]
    # distinct spellings of the SAME uuid overwrite one stored user,
    # never two
    store = UserStore()
    store.add_user("x", user_id=canon)
    store.add_user("x", user_id=canon.upper())
    assert len(store._users) == 1
    # non-v4 canonical ids (e.g. v1) authenticate via parse_token, so
    # add_user must accept them too (uuid.UUID(s, version=4) rewrites the
    # version nibble and must NOT be used for validation)
    v1 = "c232ab00-9414-11ec-b3c8-9f68deced846"
    t1 = store.add_user("y", roles=["q"], user_id=v1)
    assert store.authenticate(t1) == ["q"]
