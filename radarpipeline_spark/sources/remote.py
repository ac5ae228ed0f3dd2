"""Remote dataset access.

The reference bulk-downloads SFTP trees to local disk with a
multiprocessing pool before reading (reference:
radarpipeline/io/downloader.py:37-59, paramiko connector at
io/connection.py:49-250).  In a Spark-first engine that stage is
usually unnecessary: object stores and HDFS are read directly by the
executors through Hadoop FileSystem URIs — no driver-side staging, no
single-machine bandwidth bottleneck, locality + retry handled by the
framework.

* :func:`normalize_uri` — validates/normalizes dataset URIs; the
  engine's readers accept anything Hadoop FS can open (s3a://, gs://,
  abfss://, hdfs://, file://).
* :func:`fetch_sftp_dataset` — parity shim for genuinely SFTP-only
  deployments: stages ``<root>/<user>/<variable>/*`` to a local dir.
  Gated on paramiko (not bundled here); the function documents the
  contract and fails with actionable guidance otherwise.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

_HADOOP_SCHEMES = {"s3a", "s3", "gs", "abfss", "wasbs", "hdfs", "file", "viewfs", "oss"}


def normalize_uri(path_or_uri: str) -> str:
    """Return a URI Spark/Hadoop FileIO can read directly.

    Bare local paths become file:// URIs; known object-store/HDFS
    schemes pass through; anything else (sftp://, ftp://) needs staging
    via :func:`fetch_sftp_dataset`.
    """
    parsed = urlparse(path_or_uri)
    if not parsed.scheme:
        return "file://" + os.path.abspath(path_or_uri)
    if parsed.scheme in _HADOOP_SCHEMES:
        return path_or_uri
    raise ValueError(
        f"scheme {parsed.scheme!r} is not directly readable by Spark; "
        "stage it first (fetch_sftp_dataset for sftp://)"
    )


def fetch_sftp_dataset(
    host: str,
    remote_root: str,
    local_root: str,
    username: str,
    password: str | None = None,
    private_key: str | None = None,
    port: int = 22,
) -> str:
    """Stage an SFTP dataset tree locally (reference parity: the
    SftpDataReader role).  Requires paramiko."""
    try:
        import paramiko  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without paramiko
        raise ImportError(
            "SFTP staging needs paramiko (`pip install paramiko`); "
            "prefer serving the dataset from an object store and "
            "reading it directly via normalize_uri()"
        ) from e
    transport = paramiko.Transport((host, port))  # pragma: no cover
    try:  # pragma: no cover
        if private_key:
            transport.connect(
                username=username, pkey=paramiko.RSAKey.from_private_key_file(private_key)
            )
        else:
            transport.connect(username=username, password=password)
        sftp = paramiko.SFTPClient.from_transport(transport)
        _mirror(sftp, remote_root, local_root)
    finally:  # pragma: no cover
        transport.close()
    return local_root


def _mirror(sftp, remote_dir: str, local_dir: str) -> None:  # pragma: no cover
    import stat as statmod

    os.makedirs(local_dir, exist_ok=True)
    for entry in sftp.listdir_attr(remote_dir):
        rpath = f"{remote_dir}/{entry.filename}"
        lpath = os.path.join(local_dir, entry.filename)
        if statmod.S_ISDIR(entry.st_mode):
            _mirror(sftp, rpath, lpath)
        else:
            sftp.get(rpath, lpath)
