"""Git-hosted feature-plugin fetch — the reference's config-time clone.

The reference resolves each feature location that looks like a GitHub
URL by cloning it into ``~/.cache/radarpipeline/<repo>``, hard-resetting
the work tree, checking out the requested branch (warning and falling
back to the repo's active branch if it doesn't exist) and pulling
(reference: radarpipeline/project/validations.py:149-187, via
gitpython).  This module reproduces that contract with the stock ``git``
CLI via subprocess — no gitpython dependency — and accepts any URL git
itself accepts (https/ssh/``file://``), which also makes the whole path
testable against a local fixture repository with no network.
"""

from __future__ import annotations

import logging
import os
import re
import subprocess

logger = logging.getLogger(__name__)

_URL_RE = re.compile(
    r"^(https?://|git@|ssh://|git://|file://)|\.git$"
)


def is_git_location(location: str) -> bool:
    """True for anything that should be fetched with git rather than
    used as a local path (reference: utils.is_valid_github_path, widened
    to every scheme the git CLI accepts)."""
    return bool(_URL_RE.search(location))


def repo_name_from_url(url: str) -> str:
    """``https://host/org/repo.git`` -> ``repo`` (reference:
    utils.get_repo_name_from_url)."""
    tail = url.rstrip("/").rsplit("/", 1)[-1]
    return tail[:-4] if tail.endswith(".git") else tail


def _git(*args: str, cwd: str | None = None, check: bool = True):
    return subprocess.run(
        ["git", *args], cwd=cwd, check=check,
        capture_output=True, text=True,
    )


def resolve_feature_location(
    location: str,
    branch: str | None = None,
    cache_root: str | None = None,
) -> str:
    """Resolve a feature location to a local directory.

    * git URL: clone into ``<cache_root>/<repo>`` (default
      ``~/.cache/radarpipeline_spark``) on first use; afterwards hard
      reset + clean so stale local edits never leak into a run;
      checkout ``branch`` when given, warning and keeping the current
      branch if it does not exist (the reference's fallback), then pull
      (ignored when the remote is unreachable — the cache keeps
      working offline, unlike the reference which raises).
    * local path: expanduser + must be an existing directory.
    """
    if not is_git_location(location):
        path = os.path.expanduser(location)
        if not os.path.isdir(path):
            raise ValueError(f"Invalid feature location: {location}")
        logger.info("Using feature from local path: %s", path)
        return path

    cache_root = cache_root or os.path.join(
        os.path.expanduser("~"), ".cache", "radarpipeline_spark"
    )
    dest = os.path.join(cache_root, repo_name_from_url(location))
    if not os.path.isdir(os.path.join(dest, ".git")):
        os.makedirs(cache_root, exist_ok=True)
        _git("clone", location, dest)
    else:
        _git("reset", "--hard", cwd=dest)
        _git("clean", "-xdf", cwd=dest)
    if branch:
        co = _git("checkout", branch, cwd=dest, check=False)
        if co.returncode != 0:
            cur = _git(
                "rev-parse", "--abbrev-ref", "HEAD", cwd=dest
            ).stdout.strip()
            logger.warning(
                "Branch %s does not exist. Using the %s branch instead.",
                branch, cur,
            )
            branch = cur
    pull = _git("pull", "origin", branch or "HEAD", cwd=dest, check=False)
    if pull.returncode != 0:
        logger.warning(
            "git pull failed for %s (offline? %s); using cached checkout",
            location, pull.stderr.strip()[:200],
        )
    logger.info("Using feature from cache location: %s", dest)
    return dest
