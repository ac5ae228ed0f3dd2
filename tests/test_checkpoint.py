"""Kill-and-resume: interrupted run + resume == uninterrupted run."""

import json
import os

import pyspark.sql.functions as F

from radarpipeline_spark.checkpoint import CheckpointedFeatureRun, input_lineage_of
from radarpipeline_spark.operators import feature_vector


def _norm(df):
    return df.select(
        F.concat_ws(
            "\x01",
            *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in sorted(df.columns)],
        ).alias("r")
    )


def test_kill_and_resume_identical(spark, tiny, tmp_path):
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "interrupted")
    build = lambda df: feature_vector(df)  # noqa: E731

    # uninterrupted run
    full = CheckpointedFeatureRun(full_dir, n_buckets=8)
    full.run(spark, build, tiny)
    assert full.is_complete()

    # interrupted: process 3 buckets, "crash", then resume
    part = CheckpointedFeatureRun(part_dir, n_buckets=8)
    part.run(spark, build, tiny, max_buckets=3)
    assert not part.is_complete()
    assert len(part.completed_buckets()) == 3
    resumed = CheckpointedFeatureRun(part_dir, n_buckets=8)
    res = resumed.run(spark, build, tiny)
    assert len(res) == 5  # only the missing buckets ran
    assert resumed.is_complete()

    a = _norm(full.read_output(spark))
    b = _norm(resumed.read_output(spark))
    assert a.count() == b.count() == tiny.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_manifest_lineage_and_metrics(spark, tiny, tmp_path):
    out = str(tmp_path / "m")
    run = CheckpointedFeatureRun(out, n_buckets=4)
    lineage = input_lineage_of(["/root/testdata/sf0.001"])
    results = run.run(spark, lambda df: feature_vector(df), tiny, input_lineage=lineage)
    assert sum(r.rows_out for r in results) == tiny.count()
    assert all(r.bytes_out > 0 for r in results)
    with open(os.path.join(out, "manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 4
    assert {r["bucket"] for r in recs} == {0, 1, 2, 3}
    assert all(r["input_lineage"] == lineage for r in recs)
    assert len({r["feature_schema_hash"] for r in recs}) == 1
    # rerun on a complete output is a no-op
    assert run.run(spark, lambda df: feature_vector(df), tiny) == []


def test_torn_manifest_line_recovers(spark, tiny, tmp_path):
    """A crash mid-append leaves a torn trailing line; the bucket must
    be treated as uncommitted and recomputed, not crash the run."""
    out = str(tmp_path / "torn")
    run = CheckpointedFeatureRun(out, n_buckets=4)
    run.run(spark, lambda df: feature_vector(df), tiny, max_buckets=2)
    with open(run.manifest_path, "a") as f:
        f.write('{"status": "committed", "bucket"')  # torn write
    resumed = CheckpointedFeatureRun(out, n_buckets=4)
    assert len(resumed.completed_buckets()) == 2
    res = resumed.run(spark, lambda df: feature_vector(df), tiny)
    assert len(res) == 2 and resumed.is_complete()
    assert resumed.read_output(spark).count() == tiny.count()
