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
    store = UserStore()
    token = store.add_user("bob", roles=["admin"])
    uid = token.split(":")[0]
    with pytest.raises(AuthenticationFailed):
        store.authenticate(f"{uid}:wrong-key")
    with pytest.raises(AuthenticationFailed):
        store.authenticate("nobody:key")
    with pytest.raises(ImproperUserToken):
        store.authenticate("no-colon-token")
    with pytest.raises(ImproperUserToken):
        store.authenticate("a:b:c")
    with pytest.raises(ImproperUserToken):
        store.authenticate("  ")


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
