"""Large-object (data-plane) request probe on a real S3 REST endpoint
(round 13 — the carried second half of tools/moto_request_probe.py).

moto_request_probe measured the METADATA plane (tiny manifest/lease
objects). This probe measures the DATA-FILE sizes the engine's
object-store promotion path actually moves — staged parquet promoted by
``MetaFS.copy_tree`` (server-side CopyObject) and, for comparison, the
two write paths at 1 KB / 8 MB / 64 MB:

- boto3 single-part ``put_object`` (the engine's metadata path): always
  ONE request at these sizes (S3's single-part ceiling is 5 GB — far
  above any engine metadata object, which is why ``put_text`` never
  needs multipart).
- pyarrow ``open_output_stream`` (the no-boto3 fallback): multipart
  create/upload/complete — request count grows with size at pyarrow's
  part size, and moto rejects aws-sdk-cpp's CompleteMultipartUpload
  outright (the round-12 finding that motivated the boto3 path).
- server-side ``copy_file`` (what ``copy_tree`` promotion issues per
  staged file): ONE CopyObject regardless of size below the 5 GB
  UploadPartCopy threshold — promotion cost is per FILE, not per byte,
  which is the 100 TB point: segment promotion never re-streams data
  through the driver.

Prints one JSON line: {"metric": "s3_data_plane_requests", ...}

Usage: python tools/moto_multipart_probe.py
"""

from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _RequestCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines: list[str] = []

    def emit(self, record):
        self.lines.append(record.getMessage())

    def take(self) -> list[str]:
        out, self.lines = self.lines, []
        return out


SIZES = {"1kb": 1024, "8mb": 8 * 1024 * 1024, "64mb": 64 * 1024 * 1024}


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
    bucket = "mp-probe"
    client = boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing",
    )
    client.create_bucket(Bucket=bucket)
    configure_object_store(
        f"s3://{bucket}", endpoint=endpoint, region="us-east-1",
        access_key="testing", secret_key="testing",
    )
    root = f"s3://{bucket}/probe"
    fs = get_fs(root)
    out: dict = {"metric": "s3_data_plane_requests"}

    for label, size in SIZES.items():
        body = os.urandom(1024) * (size // 1024)

        # 1. boto3 single-part put (the engine's metadata write path)
        counter.take()
        client.put_object(Bucket=bucket, Key=f"probe/b_{label}",
                          Body=body)
        out[f"boto3_put_{label}"] = len(counter.take())

        # 2. pyarrow output stream (multipart; the no-boto3 fallback)
        try:
            counter.take()
            with fs._fs.open_output_stream(
                    fs._p(fs.join(root, f"p_{label}"))) as f:
                f.write(body)
            out[f"pyarrow_put_{label}"] = len(counter.take())
        except OSError as e:
            out[f"pyarrow_put_{label}"] = len(counter.take())
            out[f"pyarrow_put_{label}_error"] = type(e).__name__

        # 3. server-side copy (what copy_tree promotion issues per file)
        counter.take()
        fs._fs.copy_file(fs._p(fs.join(root, f"b_{label}")),
                         fs._p(fs.join(root, f"c_{label}")))
        out[f"copy_file_{label}"] = len(counter.take())

    # 4. a staged-dir promotion end-to-end: copy_tree of a 3-file dir
    for i in range(3):
        client.put_object(Bucket=bucket, Key=f"probe/staged/f{i}.parquet",
                          Body=os.urandom(1024) * (4 * 1024))
    counter.take()
    fs.copy_tree(fs.join(root, "staged"), fs.join(root, "promoted"))
    out["copy_tree_3x4mb_requests"] = len(counter.take())

    _CACHE.pop(f"s3://{bucket}", None)
    server.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
