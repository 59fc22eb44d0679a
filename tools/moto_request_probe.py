"""Real-S3-protocol request-count probe (round 12).

DelayFS charges `put_text` as ONE metadata round-trip, but on real S3
pyarrow's ObjectOutputStream issues a MULTIPART upload — 3 HTTP
requests (CreateMultipartUpload / UploadPart / CompleteMultipartUpload)
per tiny manifest object, tripling the metadata bill a 10k-bucket
publish pays. Round 12 switched `ArrowMetaFS.put_text` to one
single-part boto3 `put_object`; this probe MEASURES both claims against
an in-process moto server (a real HTTP S3 REST endpoint) by counting
the actual requests werkzeug serves.

Prints one JSON line:
    {"metric": "s3_requests_per_op", "put_text_requests": 1,
     "pyarrow_stream_requests": 3, "register_manifest_requests": N, ...}

Usage: python tools/moto_request_probe.py
"""

from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _RequestCounter(logging.Handler):
    """Counts werkzeug access-log lines, i.e. actual HTTP requests the
    moto endpoint served."""

    def __init__(self):
        super().__init__()
        self.lines: list[str] = []

    def emit(self, record):
        self.lines.append(record.getMessage())

    def take(self) -> list[str]:
        out, self.lines = self.lines, []
        return out


def main() -> None:
    import boto3
    from moto.server import ThreadedMotoServer

    from druid_hadoop_utils_spark.sources.fs import (
        _CACHE,
        configure_object_store,
        get_fs,
    )

    wlog = logging.getLogger("werkzeug")
    wlog.setLevel(logging.INFO)
    counter = _RequestCounter()
    wlog.addHandler(counter)
    wlog.propagate = False

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0,
                                verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    bucket = "probe-bucket"
    boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing",
    ).create_bucket(Bucket=bucket)
    configure_object_store(
        f"s3://{bucket}", endpoint=endpoint, region="us-east-1",
        access_key="testing", secret_key="testing",
    )
    root = f"s3://{bucket}/probe"
    fs = get_fs(root)
    out: dict = {"metric": "s3_requests_per_op"}

    # 1. put_text through the engine (round-12 single-part path)
    counter.take()
    fs.put_text(fs.join(root, "m1.json"), '{"k": 1}')
    out["put_text_requests"] = len(counter.take())

    # 2. the pre-round-12 path for comparison: pyarrow's output stream
    #    (multipart) writing the same bytes
    try:
        counter.take()
        with fs._fs.open_output_stream(fs._p(fs.join(root, "m2.json"))) as f:
            f.write(b'{"k": 1}')
        out["pyarrow_stream_requests"] = len(counter.take())
    except OSError as e:
        # moto rejects aws-sdk-cpp's CompleteMultipartUpload — exactly
        # the failure that surfaced the multipart behavior; count what
        # was attempted before the error
        out["pyarrow_stream_requests"] = len(counter.take())
        out["pyarrow_stream_error"] = type(e).__name__

    # 3. one manifest registration end-to-end (read-modify-write of the
    #    per-segment manifest file + stamp clamp listing)
    from datetime import datetime, timezone

    from druid_hadoop_utils_spark.intervals import Interval
    from druid_hadoop_utils_spark.sources.segments import (
        SegmentManifest,
        register_manifest,
    )

    iv = Interval(datetime(2024, 1, 1, tzinfo=timezone.utc),
                  datetime(2024, 1, 2, tzinfo=timezone.utc))
    counter.take()
    register_manifest(root, SegmentManifest(
        "ds", iv, "v1", 0, fs.join(root, "ds", "d0")))
    out["first_register_manifest_requests"] = len(counter.take())
    counter.take()
    register_manifest(root, SegmentManifest(
        "ds", iv, "v2", 0, fs.join(root, "ds", "d1")))
    out["warm_register_manifest_requests"] = len(counter.take())

    # 4. lease acquire + release (conditional put + read + delete)
    from druid_hadoop_utils_spark.sources.lease import maintenance_lease

    counter.take()
    with maintenance_lease(root, "ds", "probe"):
        pass
    out["lease_acquire_release_requests"] = len(counter.take())

    _CACHE.pop(f"s3://{bucket}", None)
    server.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
