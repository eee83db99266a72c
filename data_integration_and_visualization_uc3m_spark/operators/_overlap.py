"""Driver-side job overlap (optimization guide §2.6).

Spark happily runs several jobs at once inside one application;
actions are only sequential because driver code calls them
sequentially. Checkpoint-heavy operators here pay a measured
~0.2-0.5 s scheduling floor PER eager job on this host (r14
"Not yet optimized" #1) — when two checkpoint chains are independent
(e.g. a k-NN graph build and the corpus scoring relation the beam
search needs next to it), submitting them from a small thread pool
lets the second chain's tasks back-fill executors freed by the first
chain's tail instead of waiting for the whole job to finish.

``overlap`` runs each thunk on its own ``inheritable_thread_target``
thread (the documented PySpark way to run driver threads so JVM
thread-local properties — job group, description — are inherited and
cleaned up) and returns their results in argument order. Exceptions
propagate to the caller exactly as in sequential code; remaining
thunks still run to completion (futures are joined), so no checkpoint
is leaked half-built.

Results are unchanged by construction: each thunk materializes the
same deterministic plan it would have materialized sequentially —
only the wall-clock overlap differs. FIFO scheduling (the default)
gives the first-submitted chain priority and back-fills the rest,
which is exactly the behavior the guide prescribes.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession
from pyspark.util import inheritable_thread_target


def overlap(*thunks):
    """Run independent job-submitting thunks concurrently; return
    their results in argument order. With one thunk, runs inline."""
    if len(thunks) == 1:
        return (thunks[0](),)
    # Passing the session inherits tags as well as local properties
    # (and silences the tags warning); fall back to the bare wrapper
    # when no session is active yet.
    session = SparkSession.getActiveSession()
    wrap = (
        inheritable_thread_target(session)
        if session is not None
        else inheritable_thread_target
    )
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(wrap(t)) for t in thunks]
        # collect every result before raising so a failing sibling
        # doesn't abandon a half-submitted job chain
        results, first_err = [], None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = exc
                results.append(None)
        if first_err is not None:
            raise first_err
        return tuple(results)
