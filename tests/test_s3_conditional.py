"""ArrowMetaFS S3 conditional writes (round 11).

The boto3-backed `If-None-Match: *` PUT and ETag `If-Match` DELETE —
the real-S3 half of the conditional-write lease upgrade whose protocol
the objectcas:// simulation proves end-to-end (tests/test_lease.py).
These tests pin the request translation (bucket/key split, conditional
headers, ETag derivation) and the error→outcome mapping against a fake
client speaking boto3's ClientError shape; no network, no credentials.
"""

from __future__ import annotations

import hashlib

import pytest

from druid_hadoop_utils_spark.sources.fs import ArrowMetaFS


def _client_error(code: str) -> Exception:
    e = Exception(code)
    e.response = {"Error": {"Code": code}}
    return e


class _FakeS3Client:
    """Just enough of boto3's S3 client: conditional PUT/DELETE with
    the documented error codes."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.calls: list[tuple] = []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.calls.append(("put", Bucket, Key, IfNoneMatch))
        if IfNoneMatch != "*":
            raise AssertionError("unconditional PUT through the CAS path")
        if (Bucket, Key) in self.objects:
            raise _client_error("PreconditionFailed")
        self.objects[(Bucket, Key)] = Body

    def delete_object(self, Bucket, Key, IfMatch=None):
        self.calls.append(("delete", Bucket, Key, IfMatch))
        if IfMatch is None:
            raise AssertionError(
                "unconditional DELETE through the CAS path")
        cur = self.objects.get((Bucket, Key))
        if cur is None:
            raise _client_error("NoSuchKey")
        if IfMatch != '"' + hashlib.md5(cur).hexdigest() + '"':
            raise _client_error("PreconditionFailed")
        del self.objects[(Bucket, Key)]


@pytest.fixture
def fs():
    inst = ArrowMetaFS.from_filesystem(
        backend=None, scheme="s3", netloc="bkt", netloc_in_path=True,
        boto_opts={})
    inst._conditional = _FakeS3Client()
    return inst


def test_flags_on_when_boto3_importable(fs):
    # boto3 ships in this environment, so the flags turn on
    assert fs.supports_put_if_absent
    assert fs.supports_conditional_delete


def test_put_if_absent_translates_and_wins_once(fs):
    path = "s3://bkt/tbl/_segments/_commit.json"
    assert fs.put_text_if_absent(path, "lease-a") is True
    assert fs.put_text_if_absent(path, "lease-b") is False  # 412
    kind, bucket, key, cond = fs._conditional.calls[0]
    assert (kind, bucket, key, cond) == (
        "put", "bkt", "tbl/_segments/_commit.json", "*")
    assert fs._conditional.objects[("bkt", "tbl/_segments/_commit.json")] \
        == b"lease-a"


def test_conditional_delete_match_mismatch_missing(fs):
    path = "s3://bkt/tbl/_segments/_lease.json"
    fs._conditional.objects[("bkt", "tbl/_segments/_lease.json")] = b"v1"
    # mismatch (content changed since read): refused, object intact
    assert fs.delete_file_if_unchanged(path, "v0") is False
    assert ("bkt", "tbl/_segments/_lease.json") in fs._conditional.objects
    # match: deleted — the ETag sent is the quoted content MD5
    assert fs.delete_file_if_unchanged(path, "v1") is True
    _k, _b, _key, etag = fs._conditional.calls[-1]
    assert etag == '"' + hashlib.md5(b"v1").hexdigest() + '"'
    # already gone (another stealer won): refused
    assert fs.delete_file_if_unchanged(path, "v1") is False


def test_conflict_code_maps_to_lost(fs):
    class Conflicting(_FakeS3Client):
        def put_object(self, **kw):
            raise _client_error("ConditionalRequestConflict")

        def delete_object(self, **kw):
            raise _client_error("ConditionalRequestConflict")

    fs._conditional = Conflicting()
    assert fs.put_text_if_absent("s3://bkt/x", "t") is False
    assert fs.delete_file_if_unchanged("s3://bkt/x", "t") is False


def test_unexpected_errors_propagate(fs):
    class Broken(_FakeS3Client):
        def put_object(self, **kw):
            raise _client_error("AccessDenied")

    fs._conditional = Broken()
    with pytest.raises(Exception, match="AccessDenied"):
        fs.put_text_if_absent("s3://bkt/x", "t")


def test_gcs_and_missing_boto_refuse_loudly():
    gs = ArrowMetaFS.from_filesystem(
        backend=None, scheme="gs", netloc="bkt", netloc_in_path=True)
    assert not gs.supports_put_if_absent
    with pytest.raises(NotImplementedError):
        gs.put_text_if_absent("gs://bkt/x", "t")


def test_real_boto3_model_via_stubber():
    """The fake client can't catch a parameter boto3's real S3 model
    would reject — drive both conditional calls through a stubbed REAL
    client (botocore validates request shape), including the error
    mapping from genuine ClientError objects."""
    boto3 = pytest.importorskip("boto3")
    from botocore.stub import Stubber

    client = boto3.client("s3", region_name="us-east-1",
                          aws_access_key_id="x", aws_secret_access_key="y")
    fs = ArrowMetaFS.from_filesystem(
        backend=None, scheme="s3", netloc="bkt", netloc_in_path=True,
        boto_opts={})
    fs._conditional = client
    stub = Stubber(client)
    etag = '"' + hashlib.md5(b"lease-v1").hexdigest() + '"'
    stub.add_response("put_object", {}, {
        "Bucket": "bkt", "Key": "t/_segments/_commit.json",
        "Body": b"lease-v1", "IfNoneMatch": "*"})
    stub.add_client_error("put_object", service_error_code="PreconditionFailed",
                          http_status_code=412)
    stub.add_response("delete_object", {}, {
        "Bucket": "bkt", "Key": "t/_segments/_commit.json",
        "IfMatch": etag})
    stub.add_client_error("delete_object", service_error_code="NoSuchKey",
                          http_status_code=404)
    with stub:
        p = "s3://bkt/t/_segments/_commit.json"
        assert fs.put_text_if_absent(p, "lease-v1") is True
        assert fs.put_text_if_absent(p, "lease-v2") is False   # real 412
        assert fs.delete_file_if_unchanged(p, "lease-v1") is True
        assert fs.delete_file_if_unchanged(p, "lease-v1") is False  # 404
    stub.assert_no_pending_responses()


def test_anonymous_store_never_routes_metadata_through_boto3():
    """An anonymous (or boto-disabled) s3 store sets boto_opts=None: the
    metadata fast paths must stay on the configured pyarrow backend —
    a default-chain boto3 client would sign with ambient credentials
    against the wrong endpoint (round-12 review catch)."""
    fs = ArrowMetaFS.from_filesystem(
        backend=None, scheme="s3", netloc="bkt", netloc_in_path=True,
        boto_opts=None)
    assert not fs.supports_put_if_absent
    assert fs._boto_metadata_client() is None
    # and a configured instance DOES use it
    fs2 = ArrowMetaFS.from_filesystem(
        backend=None, scheme="s3", netloc="bkt", netloc_in_path=True,
        boto_opts={})
    fs2._conditional = _FakeS3Client()
    assert fs2._boto_metadata_client() is not None
