"""CLI: config-driven feature runs, packaged for spark-submit.

Mirrors the reference's YAML-config UX (``python .`` reading
config.yaml — reference: __main__.py:4, radarpipeline/radarpipeline.py:
13-35, schema at common/utils.py:140-177) but cluster-first::

    # local dev
    python -m radarpipeline_spark --config job.yaml

    # cluster
    zip -r engine.zip radarpipeline_spark
    spark-submit --py-files engine.zip -m radarpipeline_spark/cli.py \\
        --config job.yaml

Config keys (all optional except input):

    input:
      path: /data/transcripts.parquet   # parquet transcripts table
      format: parquet | events | radar_csv
      variable: android_phone_step_count  # radar_csv only (required)
      time_col: value.time              # radar_csv only (default)
      users: [uid1, uid2]               # radar_csv only (optional filter)
      aux_path: /data/aux.parquet       # optional as-of right side
    features:
      gap_seconds: 1800
      last_k: 10
      range_seconds: 300
      chunk_rows: 65536                 # skew chunking (0 = plain path)
      # OR plugin mode (reference-style FeatureGroup discovery; needs
      # input.format radar_csv, reads the variables the groups require):
      modules: [my_pkg.features, /plugins/extra_features.py]
      feature_names: [step_count_per_day]   # optional filter (warns)
    output:
      path: /out/features
      format: parquet | csv
      n_buckets: 16                     # checkpointed buckets (0 = single job)

Unlike the reference, the Spark master is NOT hardcoded
(reference pins master("local") making its executor configs inert,
reference: radarpipeline/io/reader.py:81): spark-submit owns deployment.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_config(path: str) -> dict:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    validate_config(cfg)
    return cfg


def validate_config(cfg: dict) -> None:
    """Fail-fast config validation (the reference's ConfigValidator role,
    reference: radarpipeline/project/validations.py:17-229, re-derived
    for this engine's schema)."""
    if not isinstance(cfg, dict):
        raise ValueError("config must be a mapping")
    for section in ("input", "output"):
        if section not in cfg or not isinstance(cfg[section], dict):
            raise ValueError(f"config missing required section: {section}")
    if "path" not in cfg["input"]:
        raise ValueError("input.path is required")
    fmt = cfg["input"].get("format", "parquet")
    if fmt not in ("parquet", "events", "radar_csv"):
        raise ValueError(
            f"input.format must be parquet|events|radar_csv, got {fmt!r}"
        )
    feats = cfg.get("features", {})
    modules = feats.get("modules")
    if modules is not None:
        if not (isinstance(modules, list) and modules
                and all(isinstance(m, str) for m in modules)):
            raise ValueError("features.modules must be a non-empty list of strings")
        if fmt != "radar_csv":
            raise ValueError("features.modules requires input.format: radar_csv")
    if fmt == "radar_csv" and modules is None and "variable" not in cfg["input"]:
        raise ValueError("input.variable is required for format: radar_csv")
    if "path" not in cfg["output"]:
        raise ValueError("output.path is required")
    for key in ("gap_seconds", "last_k", "range_seconds", "chunk_rows"):
        if key in feats and (not isinstance(feats[key], int) or feats[key] < 0):
            raise ValueError(f"features.{key} must be a non-negative integer")
    nb = cfg["output"].get("n_buckets", 16)
    if not isinstance(nb, int) or nb < 0:
        raise ValueError("output.n_buckets must be a non-negative integer")


def build_features(spark, cfg: dict):
    from radarpipeline_spark.operators import asof_join, feature_vector
    from radarpipeline_spark.operators.skew import skew_routed_feature_vector
    from radarpipeline_spark.sources import (
        aux_signals_from_events,
        transcripts_from_events,
    )

    icfg = cfg["input"]
    fmt = icfg.get("format", "parquet")
    if fmt == "parquet":
        t = spark.read.parquet(icfg["path"])
    elif fmt == "events":
        t = transcripts_from_events(spark.read.parquet(icfg["path"]))
    elif fmt == "radar_csv":
        from radarpipeline_spark.sources.radar_csv import read_radar_variable
        from radarpipeline_spark.sources.transcripts import transcripts_from_radar

        raw = read_radar_variable(
            spark, icfg["path"], icfg["variable"], users=icfg.get("users")
        )
        t = transcripts_from_radar(
            raw, time_col=icfg.get("time_col", "value.time")
        )
    else:
        raise SystemExit(f"unsupported input format: {fmt}")
    aux = None
    if icfg.get("aux_path"):
        aux = spark.read.parquet(icfg["aux_path"])
    elif fmt == "events" and icfg.get("aux_from_events", False):
        aux = aux_signals_from_events(spark.read.parquet(icfg["path"]))

    f = cfg.get("features", {})
    chunk_rows = int(f.get("chunk_rows", 65536))

    def build(df):
        if chunk_rows:
            out = skew_routed_feature_vector(
                df,
                chunk_rows=chunk_rows,
                gap_seconds=int(f.get("gap_seconds", 1800)),
                last_k=int(f.get("last_k", 10)),
                range_seconds=int(f.get("range_seconds", 300)),
            )
        else:
            out = feature_vector(
                df,
                gap_seconds=int(f.get("gap_seconds", 1800)),
                last_k=int(f.get("last_k", 10)),
                range_seconds=int(f.get("range_seconds", 300)),
            )
        if aux is not None:
            out = asof_join(out, aux)
        return out

    return t, build


def run_plugin_pipeline(spark, cfg: dict) -> dict:
    """The reference's main flow: discover FeatureGroup plugins by
    module/path, read only the variables they require, fan out every
    feature, write one table per feature (reference:
    radarpipeline/radarpipeline.py:13-35 + project/project.py:161-215).
    """
    from radarpipeline_spark.features.api import discover_feature_groups
    from radarpipeline_spark.features.fetch import (
        is_git_location,
        resolve_feature_location,
    )
    from radarpipeline_spark.sinks.writer import write_features
    from radarpipeline_spark.sources.radar_csv import read_radar_dataset

    feats = cfg.get("features", {})
    # git-hosted plugin repos resolve to a local cache checkout first
    # (reference: project/validations.py:149-187); plain module names
    # and local paths pass through untouched
    modules = [
        resolve_feature_location(m, branch=feats.get("branch"))
        if is_git_location(m)
        else m
        for m in feats["modules"]
    ]
    groups = [g for m in modules for g in discover_feature_groups(m)]
    variables = sorted({v for g in groups for v in g.required_input_data})
    data = read_radar_dataset(
        spark, cfg["input"]["path"], variables, cfg["input"].get("users")
    )
    names = feats.get("feature_names")
    results: dict = {}
    for g in groups:
        results.update(g.compute(data, names))
    paths = write_features(
        results, cfg["output"]["path"], fmt=cfg["output"].get("format", "parquet")
    )
    return {
        "output": cfg["output"]["path"],
        "features": sorted(paths),
        "groups": [g.name for g in groups],
        "complete": True,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="radarpipeline_spark")
    ap.add_argument("--config", required=True, help="YAML job config")
    ap.add_argument("--master", default=None, help="override master (dev only)")
    args = ap.parse_args(argv)
    cfg = load_config(args.config)

    from radarpipeline_spark import get_spark
    from radarpipeline_spark.checkpoint import CheckpointedFeatureRun, input_lineage_of

    spark = get_spark(app_name="radarpipeline_spark", master=args.master)
    if cfg.get("features", {}).get("modules"):
        print(json.dumps(run_plugin_pipeline(spark, cfg)))
        return 0
    t, build = build_features(spark, cfg)

    ocfg = cfg["output"]
    n_buckets = int(ocfg.get("n_buckets", 16))
    summary: dict = {"output": ocfg["path"]}
    if n_buckets:
        run = CheckpointedFeatureRun(ocfg["path"], n_buckets=n_buckets)
        results = run.run(
            spark,
            build,
            t,
            input_lineage=input_lineage_of([cfg["input"]["path"]]),
        )
        summary["buckets_run"] = len(results)
        summary["rows_out"] = sum(r.rows_out for r in results)
        summary["bytes_out"] = sum(r.bytes_out for r in results)
        summary["complete"] = run.is_complete()
    else:
        out = build(t)
        out.write.mode("overwrite").parquet(ocfg["path"])
        summary["rows_out"] = spark.read.parquet(ocfg["path"]).count()
        summary["complete"] = True
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
