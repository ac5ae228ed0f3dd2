"""100M-turn single-box spot check (BASELINE.md; refreshed per round).

Replicates the r3 configuration exactly so the numbers stay
comparable: the seeded 100,485,144-turn table (4.6M conversations
incl. four 5M-turn skewed ones), the full skew-routed feature vector
(bulk strategy sliding — the synthetic gap model averages ~300s, so a
trailing 300s frame holds ~1 row, the density regime where sliding
wins; chunked giants run prefix), local[32], 256 shuffle partitions,
honest-cold (fresh session per rep, clearCache, plan built inside the
timed region), min-of-reps, tmpfs spark.local.dir, steal reported.

Usage::

    python tools/bench_100m.py [--convs 4600000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _gen, _steal_jiffies, log  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=4_600_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--path",
        type=str,
        default="",
        help="existing synthesized table (skips generation; the "
        "synthesizer is seed-deterministic so any prior round's table "
        "of the same shape is byte-identical)",
    )
    args = ap.parse_args()

    from radarpipeline_spark import get_spark
    from radarpipeline_spark.operators.skew import skew_routed_feature_vector

    path = args.path or f"/tmp/bench_100m_{args.convs}.parquet"
    n_turns = _gen(path, args.convs, skew_convs=4, skew_len=5_000_000)
    log(f"input: {n_turns} turns")

    best = float("inf")
    s0, t0 = _steal_jiffies()
    for rep in range(args.reps):
        s = get_spark(
            app_name="bench-100m",
            master="local[32]",
            shuffle_partitions=256,
            extra_conf={
                "spark.ui.enabled": "false",
                "spark.driver.memory": "48g",
                "spark.local.dir": "/dev/shm/spark-bench",
            },
        )
        s.sparkContext.setLogLevel("ERROR")
        s.catalog.clearCache()
        t_0 = time.perf_counter()
        df = skew_routed_feature_vector(
            s.read.parquet(path), strategy="sliding"
        )
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t_0
        best = min(best, dt)
        log(f"  rep{rep}: {dt:.1f}s = {n_turns / dt:,.0f} turns/s")
        s.stop()
    s1, t1 = _steal_jiffies()
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "sec": round(best, 1),
                "turns_per_sec": round(n_turns / best, 0),
                "host_steal_pct": round(
                    100.0 * (s1 - s0) / max(t1 - t0, 1), 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
