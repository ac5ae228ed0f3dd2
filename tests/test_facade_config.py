"""Library facade, union util, config validation, asof property test."""

import pytest

from radarpipeline_spark.cli import validate_config
from radarpipeline_spark.sources.facade import Reader, combine_dataframes

REF_DATA = "/root/reference/tests/resources/test_data"


def test_reader_facade(spark):
    r = Reader(spark, REF_DATA).read_data()
    data = r.get_data()
    assert list(data) == ["android_phone_step_count"]
    one = r.get_data("android_phone_step_count")
    assert one.count() == 1
    byuser = r.get_user_data("test_participant")
    assert byuser["android_phone_step_count"].count() == 1
    assert r.get_user_data("nobody")["android_phone_step_count"].count() == 0
    with pytest.raises(ValueError):
        Reader(spark, REF_DATA, data_type="sftp")
    with pytest.raises(RuntimeError):
        Reader(spark, REF_DATA).get_data()


def test_combine_dataframes_schema_merge(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, 3.5)], "id int, b double")
    out = combine_dataframes([a, b])
    assert sorted(out.columns) == ["a", "b", "id"]
    rows = {r.id: (r.a, r.b) for r in out.collect()}
    assert rows[1] == ("x", None) and rows[2] == (None, 3.5)
    with pytest.raises(ValueError):
        combine_dataframes([])


@pytest.mark.parametrize(
    "cfg, msg",
    [
        ({}, "input"),
        ({"input": {}, "output": {"path": "/o"}}, "input.path"),
        ({"input": {"path": "/i", "format": "csv"}, "output": {"path": "/o"}}, "format"),
        ({"input": {"path": "/i"}, "output": {}}, "output.path"),
        (
            {"input": {"path": "/i"}, "output": {"path": "/o"},
             "features": {"gap_seconds": -1}},
            "gap_seconds",
        ),
        (
            {"input": {"path": "/i"}, "output": {"path": "/o", "n_buckets": "x"}},
            "n_buckets",
        ),
    ],
)
def test_config_validation_failures(cfg, msg):
    with pytest.raises(ValueError, match=msg.replace(".", r"\.")):
        validate_config(cfg)


def test_config_validation_accepts_minimal():
    validate_config({"input": {"path": "/i"}, "output": {"path": "/o"}})


def test_config_radar_csv_requires_variable():
    with pytest.raises(ValueError, match="input.variable"):
        validate_config(
            {"input": {"path": "/i", "format": "radar_csv"}, "output": {"path": "/o"}}
        )
    validate_config(
        {
            "input": {"path": "/i", "format": "radar_csv", "variable": "v"},
            "output": {"path": "/o"},
        }
    )


def test_feature_group_discovery_and_plugin_pipeline(spark, tmp_path):
    """Reference plugin flow (project/project.py:161-192): discover
    FeatureGroup subclasses by dotted module AND by filesystem path,
    then run them through the CLI's plugin pipeline."""
    from radarpipeline_spark.cli import run_plugin_pipeline
    from radarpipeline_spark.features.api import discover_feature_groups

    # dotted module name
    groups = discover_feature_groups(
        "radarpipeline_spark.features.radar_features"
    )
    assert [g.name for g in groups] == ["radar_demo_features"]

    # filesystem path to a user plugin file
    plugin = tmp_path / "my_plugin_features.py"
    plugin.write_text(
        "import pyspark.sql.functions as F\n"
        "from radarpipeline_spark.features.api import Feature, FeatureGroup\n"
        "class StepEvents(Feature):\n"
        "    name = 'step_events'\n"
        "    required_input_data = ['android_phone_step_count']\n"
        "    def calculate(self, data):\n"
        "        return data['android_phone_step_count'].select(\n"
        "            F.col('`key.userId`').alias('uid'))\n"
        "class MyPlugin(FeatureGroup):\n"
        "    name = 'my_plugin'\n"
        "    features = [StepEvents]\n"
    )
    got = discover_feature_groups(str(plugin))
    assert [g.name for g in got] == ["my_plugin"]

    cfg = {
        "input": {
            "path": "/root/reference/tests/resources/test_data",
            "format": "radar_csv",
        },
        "features": {
            "modules": ["radarpipeline_spark.features.radar_features"],
            "feature_names": ["step_count_per_day"],
        },
        "output": {"path": str(tmp_path / "out"), "format": "csv"},
    }
    validate_config(cfg)
    summary = run_plugin_pipeline(spark, cfg)
    assert summary["complete"] and summary["features"] == ["step_count_per_day"]
    import glob

    assert glob.glob(str(tmp_path / "out" / "step_count_per_day" / "*.csv"))


def test_cli_radar_csv_input_end_to_end(spark):
    """format: radar_csv reads the reference's own CSV fixture layout
    and runs the feature engine over it (one conversation per
    participant, turns ordered by sensor time)."""
    from radarpipeline_spark.cli import build_features

    cfg = {
        "input": {
            "path": "/root/reference/tests/resources/test_data",
            "format": "radar_csv",
            "variable": "android_phone_step_count",
        },
        "output": {"path": "/unused"},
    }
    t, build = build_features(spark, cfg)
    out = build(t).toPandas()
    assert len(out) > 0
    assert set(out.conv_id.unique()) == {"test_participant"}
    assert (out.sort_values("turn_idx").ts.diff().dropna()
            >= __import__("pandas").Timedelta(0)).all()
    assert "latency_mean_300s" in out.columns


def test_asof_property_random(spark):
    """Property: for random irregular timestamps, the Catalyst as-of
    join equals pandas merge_asof computed locally."""
    import numpy as np
    import pandas as pd

    from radarpipeline_spark.operators import asof_join

    rng = np.random.RandomState(123)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "conv_id": [f"c{i % 5}" for i in range(200)],
            "turn_idx": list(range(200)),
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in
                   np.sort(rng.randint(0, 100_000, 200))],
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": [f"c{i % 7}" for i in range(60)],  # some convs absent
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in
                   rng.randint(-1000, 110_000, 60)],
            "aux_value": rng.randn(60).round(6),
        }
    )
    lsp = spark.createDataFrame(left.assign(ts=left.ts.astype("datetime64[us]")))
    rsp = spark.createDataFrame(right.assign(ts=right.ts.astype("datetime64[us]")))
    got = (
        asof_join(lsp, rsp)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    exp_parts = []
    for conv, grp in left.groupby("conv_id"):
        r = right[right.conv_id == conv].sort_values("ts")
        merged = pd.merge_asof(
            grp.sort_values("ts"), r[["ts", "aux_value"]], on="ts",
            direction="backward",
        )
        exp_parts.append(merged)
    exp = (
        pd.concat(exp_parts)
        .rename(columns={"aux_value": "asof_aux_value"})
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    pd.testing.assert_series_equal(
        got["asof_aux_value"], exp["asof_aux_value"], check_names=False
    )


def test_normalize_uri():
    from radarpipeline_spark.sources.remote import normalize_uri

    assert normalize_uri("/data/x").startswith("file:///")
    assert normalize_uri("s3a://bucket/ds") == "s3a://bucket/ds"
    assert normalize_uri("hdfs://nn/ds") == "hdfs://nn/ds"
    with pytest.raises(ValueError, match="sftp"):
        normalize_uri("sftp://host/ds")


def test_sftp_gate_without_paramiko():
    from radarpipeline_spark.sources.remote import fetch_sftp_dataset

    with pytest.raises(ImportError, match="paramiko"):
        fetch_sftp_dataset("h", "/r", "/l", "u", "p")


def test_write_sorted_features(spark, tiny, tmp_path):
    import pyspark.sql.functions as F

    from radarpipeline_spark.sinks.writer import write_sorted_features

    path = write_sorted_features(tiny, str(tmp_path / "sorted"), n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == tiny.count()
    # files are globally range-ordered: per-file (min, max) conv_id
    # ranges must not interleave
    import glob as g
    import duckdb

    files = sorted(g.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 2
    con = duckdb.connect()
    ranges = [
        con.execute(
            f"SELECT min(conv_id || lpad(CAST(turn_idx AS VARCHAR), 8, '0')),"
            f" max(conv_id || lpad(CAST(turn_idx AS VARCHAR), 8, '0'))"
            f" FROM '{f}'"
        ).fetchone()
        for f in files
    ]
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_plugin_discovery_survives_basename_collision(tmp_path):
    """ADVICE r2: sys.path-insert + import-by-basename was short-
    circuited by sys.modules when the plugin file's basename collided
    with an already-imported module — silently scanning the WRONG
    module.  Loading via spec_from_file_location must be immune."""
    import json as _json  # ensure the colliding name is already imported

    assert _json  # (imported)
    from radarpipeline_spark.features.api import discover_feature_groups

    plugin = tmp_path / "json.py"  # collides with stdlib json
    plugin.write_text(
        "from radarpipeline_spark.features.api import Feature, FeatureGroup\n"
        "class F1(Feature):\n"
        "    name = 'f1'\n"
        "    required_input_data = []\n"
        "    def calculate(self, data):\n"
        "        return None\n"
        "class CollidingPlugin(FeatureGroup):\n"
        "    name = 'colliding_plugin'\n"
        "    features = [F1]\n"
    )
    got = discover_feature_groups(str(plugin))
    assert [g.name for g in got] == ["colliding_plugin"]
    # stdlib json must be untouched
    import sys

    assert sys.modules["json"] is _json


def test_plugin_discovery_package_dir_relative_imports(tmp_path):
    """ADVICE r3: package-dir plugins whose __init__.py does relative /
    submodule imports need the module registered in sys.modules under a
    STABLE name before exec — the old loader used a randomized
    (PYTHONHASHSEED-dependent) suffix and never registered, so the
    parent package was unresolvable and plugin classes could fail
    pickle-by-reference."""
    import sys

    from radarpipeline_spark.features.api import discover_feature_groups

    pkg = tmp_path / "my_pkg_plugin"
    pkg.mkdir()
    (pkg / "impl.py").write_text(
        "from radarpipeline_spark.features.api import Feature, FeatureGroup\n"
        "class F1(Feature):\n"
        "    name = 'f1'\n"
        "    required_input_data = []\n"
        "    def calculate(self, data):\n"
        "        return None\n"
        "class PkgPlugin(FeatureGroup):\n"
        "    name = 'pkg_plugin'\n"
        "    features = [F1]\n"
    )
    (pkg / "__init__.py").write_text("from .impl import PkgPlugin, F1\n")
    got = discover_feature_groups(str(pkg))
    assert [g.name for g in got] == ["pkg_plugin"]
    # registered under a stable private name; re-discovery reuses the
    # module so class identity (and pickle-by-reference) stays stable
    mods = [m for m in sys.modules if m.startswith("_radarpipeline_plugin_my_pkg_plugin_")]
    # parent package AND its submodule both resolve by name (the
    # relative import went through the normal finder via __path__)
    assert len(mods) == 2 and any(m.endswith(".impl") for m in mods)
    # the class resolves by reference through sys.modules (what pickle
    # does); re-discovery re-executes from disk under the SAME stable
    # name, so the name always points at the latest definition
    again = discover_feature_groups(str(pkg))
    cls = type(again[0])
    assert cls.__module__ == type(got[0]).__module__
    assert getattr(sys.modules[cls.__module__], cls.__name__) is cls


class _FakeSftpClient:
    """In-process stand-in implementing the paramiko SFTPClient subset
    fetch_sftp_dataset uses (listdir_attr/get/close) over a local
    directory — the reference tests the same surface with an
    in-process sftpserver (reference:
    tests/tests_io/test_connection.py:1-30; that package and paramiko
    are not in this sandbox, so the transport handshake stays gated
    and only the seam below it is exercised)."""

    opened = 0

    def __init__(self, root):
        self.root = root
        type(self).opened += 1
        self.closed = False

    def listdir_attr(self, path):
        import os as _os

        class A:
            pass

        out = []
        for name in sorted(_os.listdir(path)):
            a = A()
            a.filename = name
            a.st_mode = _os.stat(_os.path.join(path, name)).st_mode
            out.append(a)
        return out

    def get(self, rpath, lpath):
        import shutil

        shutil.copyfile(rpath, lpath)

    def close(self):
        self.closed = True


def test_sftp_mirror_with_fake_client(tmp_path):
    """S5 parity: full-tree staging, user/variable pruning, and the
    one-client-per-pool-worker contract — everything below the
    paramiko transport."""
    from radarpipeline_spark.sources.remote import fetch_sftp_dataset

    remote = tmp_path / "remote"
    for uid in ("u1", "u2"):
        for var in ("steps", "battery"):
            d = remote / uid / var
            d.mkdir(parents=True)
            (d / "0000.csv.gz").write_bytes(b"x" * 10)
            (d / "0001.csv.gz").write_bytes(b"y" * 10)
    (remote / "u1" / "steps" / "schema.json").write_text("{}")

    _FakeSftpClient.opened = 0
    local = tmp_path / "local_all"
    fetch_sftp_dataset(
        "ignored", str(remote), str(local),
        client_factory=lambda: _FakeSftpClient(str(tmp_path)),
        num_workers=3,
    )
    got = sorted(p.relative_to(local).as_posix() for p in local.rglob("*") if p.is_file())
    assert len(got) == 9 and "u2/battery/0001.csv.gz" in got
    assert (local / "u1/steps/schema.json").read_text() == "{}"
    # lister + at most num_workers transfer clients
    assert 2 <= _FakeSftpClient.opened <= 4

    # pruned staging: only (u1, steps) crosses the wire
    local2 = tmp_path / "local_pruned"
    fetch_sftp_dataset(
        "ignored", str(remote), str(local2),
        users=["u1"], variables=["steps"],
        client_factory=lambda: _FakeSftpClient(str(tmp_path)),
    )
    got2 = sorted(p.relative_to(local2).as_posix() for p in local2.rglob("*") if p.is_file())
    assert got2 == [
        "u1/steps/0000.csv.gz", "u1/steps/0001.csv.gz", "u1/steps/schema.json",
    ]


def test_git_plugin_fetch_roundtrip(tmp_path):
    """Reference parity (project/validations.py:149-187): git-hosted
    feature locations clone into a cache dir, hard-reset stale local
    edits, fall back with a warning when the branch doesn't exist, and
    pull updates on re-resolve.  Driven against a LOCAL fixture repo
    over file:// — the full git path, no network."""
    import subprocess

    from radarpipeline_spark.features.api import discover_feature_groups
    from radarpipeline_spark.features.fetch import (
        is_git_location,
        repo_name_from_url,
        resolve_feature_location,
    )

    assert is_git_location("https://github.com/org/repo.git")
    assert is_git_location("git@github.com:org/repo.git")
    assert not is_git_location("/plugins/local_dir")
    assert repo_name_from_url("https://h/org/myfeat.git") == "myfeat"

    plugin_src = (
        "from radarpipeline_spark.features.api import Feature, FeatureGroup\n"
        "class F1(Feature):\n"
        "    name = 'f1'\n"
        "    required_input_data = []\n"
        "    def calculate(self, data):\n"
        "        return None\n"
        "class GitPlugin(FeatureGroup):\n"
        "    name = 'NAME'\n"
        "    features = [F1]\n"
    )

    origin = tmp_path / "origin" / "myfeat"
    origin.mkdir(parents=True)
    git = lambda *a, cwd=origin: subprocess.run(  # noqa: E731
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", *a],
        cwd=cwd, check=True, capture_output=True,
    )
    git("init", "-b", "main")
    (origin / "__init__.py").write_text(plugin_src.replace("NAME", "v1"))
    git("add", "-A")
    git("commit", "-m", "v1")

    cache = str(tmp_path / "cache")
    url = "file://" + str(origin)
    # branch fallback: 'nope' doesn't exist -> warn, stay on main
    loc = resolve_feature_location(url, branch="nope", cache_root=cache)
    got = discover_feature_groups(loc)
    assert [g.name for g in got] == ["v1"]

    # upstream moves; a stale local edit in the cache must be discarded
    (origin / "__init__.py").write_text(plugin_src.replace("NAME", "v2"))
    git("add", "-A")
    git("commit", "-m", "v2")
    import pathlib

    pathlib.Path(loc, "__init__.py").write_text("garbage (")
    loc2 = resolve_feature_location(url, branch="main", cache_root=cache)
    assert loc2 == loc
    assert [g.name for g in discover_feature_groups(loc2)] == ["v2"]

    # local non-dir -> the reference's ValueError
    with pytest.raises(ValueError, match="Invalid feature location"):
        resolve_feature_location(str(tmp_path / "missing"))
