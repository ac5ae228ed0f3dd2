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


def _paramiko_client_factory(
    host: str,
    username: str,
    password: str | None,
    private_key: str | None,
    port: int,
):  # pragma: no cover - paramiko not bundled in this environment
    """Open one paramiko SFTP client (the reference opens one per pool
    worker the same way, reference: radarpipeline/io/connection.py:49).
    Returned object must be closed by the caller."""
    try:
        import paramiko  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "SFTP staging needs paramiko (`pip install paramiko`); "
            "prefer serving the dataset from an object store and "
            "reading it directly via normalize_uri()"
        ) from e
    transport = paramiko.Transport((host, port))
    if private_key:
        transport.connect(
            username=username,
            pkey=paramiko.RSAKey.from_private_key_file(private_key),
        )
    else:
        transport.connect(username=username, password=password)
    client = paramiko.SFTPClient.from_transport(transport)
    client._rp_transport = transport  # closed via close_client
    return client


def _close_client(client) -> None:
    close = getattr(client, "close", None)
    if close:
        close()
    transport = getattr(client, "_rp_transport", None)
    if transport is not None:  # pragma: no cover - paramiko only
        transport.close()


def fetch_sftp_dataset(
    host: str,
    remote_root: str,
    local_root: str,
    username: str = "",
    password: str | None = None,
    private_key: str | None = None,
    port: int = 22,
    users: list[str] | None = None,
    variables: list[str] | None = None,
    num_workers: int = 4,
    client_factory=None,
) -> str:
    """Stage an SFTP dataset tree locally (reference parity: the
    SftpDataReader role — reference: radarpipeline/io/downloader.py:37
    walks ``<root>/<uid>/<variable>/*`` with a connection pool).

    * ``users`` / ``variables`` prune the first two directory levels
      (the reference's included-users/variables filters) so only the
      requested slices cross the wire.
    * Files transfer on a ``num_workers``-thread pool, one SFTP client
      per worker (SFTP sessions are stateful; sharing one across
      threads serializes on the channel).
    * ``client_factory`` is the seam that makes the whole mirroring
      path testable without a network: any zero-arg callable returning
      an object with paramiko's ``listdir_attr(path)`` /
      ``get(remote, local)`` / ``close()`` surface.  Defaults to a
      paramiko transport (gated; not bundled in this sandbox).
    """
    if client_factory is None:  # pragma: no cover - paramiko only
        client_factory = lambda: _paramiko_client_factory(  # noqa: E731
            host, username, password, private_key, port
        )

    lister = client_factory()
    try:
        files = _plan_mirror(lister, remote_root, local_root, users, variables)
    finally:
        _close_client(lister)

    if not files:
        return local_root

    from concurrent.futures import ThreadPoolExecutor
    from threading import local as _tl

    tls = _tl()
    clients = []

    def get_one(pair):
        client = getattr(tls, "client", None)
        if client is None:
            client = tls.client = client_factory()
            clients.append(client)
        rpath, lpath = pair
        client.get(rpath, lpath)

    n = max(1, min(num_workers, len(files)))
    try:
        with ThreadPoolExecutor(max_workers=n) as pool:
            # list() forces iteration so worker exceptions propagate
            list(pool.map(get_one, files))
    finally:
        for c in clients:
            _close_client(c)
    return local_root


def _plan_mirror(
    sftp,
    remote_root: str,
    local_root: str,
    users: list[str] | None,
    variables: list[str] | None,
) -> list[tuple[str, str]]:
    """Walk ``<root>/<uid>/<variable>/...``, create local dirs, and
    return the (remote, local) file pairs to transfer.  Level-aware:
    depth 0 children filter on ``users``, depth 1 on ``variables``
    (mirrors reference: radarpipeline/io/downloader.py:37-59)."""
    import stat as statmod

    out: list[tuple[str, str]] = []

    def walk(remote_dir: str, local_dir: str, depth: int) -> None:
        os.makedirs(local_dir, exist_ok=True)
        for entry in sftp.listdir_attr(remote_dir):
            name = entry.filename
            if statmod.S_ISDIR(entry.st_mode):
                if depth == 0 and users is not None and name not in users:
                    continue
                if depth == 1 and variables is not None and name not in variables:
                    continue
                walk(f"{remote_dir}/{name}", os.path.join(local_dir, name), depth + 1)
            else:
                out.append((f"{remote_dir}/{name}", os.path.join(local_dir, name)))

    walk(remote_root.rstrip("/"), local_root, 0)
    return out
