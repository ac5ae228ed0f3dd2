"""Post-run access to streaming micro-batch physical plans.

A StreamingQuery's micro-batch plans are runtime-only: by the time a
query function returns its memory-sink table, the stream has
terminated and nothing in the returned (batch) DataFrame references
them.  But the JVM-side ``MicroBatchExecution`` keeps its
``lastExecution`` alive as long as the StreamingQuery handle is
referenced — so the three streaming entry functions register their
handle here right after ``awaitTermination``, and
``tools/plan_audit.py`` pulls the LAST micro-batch's executed plan
instead of annotating a prose row (VERDICT r5 #10).

Driver-side bookkeeping only; nothing here runs on executors or
affects the queries' results.
"""

from __future__ import annotations

LAST_QUERIES: dict[str, object] = {}


def register(name: str, query) -> None:
    """Remember ``query`` (a pyspark StreamingQuery) as the most recent
    run of streaming entry ``name``."""
    LAST_QUERIES[name] = query


def last_microbatch_plan(name: str) -> str | None:
    """The physical plan of the registered query's last micro-batch
    (None if the entry never ran in this process).  Non-extended:
    the audit counts physical markers and must not double-count
    logical-plan lines."""
    q = LAST_QUERIES.get(name)
    if q is None:
        return None
    return q._jsq.explainInternal(False)
