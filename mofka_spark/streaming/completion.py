"""Topic-completion semantics for continuous streaming queries.

Reference behavior (L8/C1): when a topic is marked complete and a
consumer has drained it, the server sends ``feed(0, NoMoreEvents)`` and
the consumer's pulls resolve to NoMoreEvents forever
(/root/reference/src/MemoryPartitionManager.cpp:150-155,
/root/reference/src/MofkaConsumer.cpp:117-132).

Spark's continuous triggers have no source-driven shutdown (a stream
runs until stopped), so the engine provides the equivalent as a drain
helper: wait for the completion flag, process everything available,
verify the committed offsets reached the ledger, then stop the query.
``Trigger.AvailableNow`` remains the one-shot form (drain-and-exit);
this helper gives long-running ProcessingTime queries the same
terminate-on-complete contract.
"""

from __future__ import annotations

import json
import time


def _end_offsets(progress) -> dict[str, int]:
    """Extract {partition: end_offset} from a query progress event; the
    Python data source serializes offsets as a JSON dict."""
    if progress is None:
        return {}
    sources = progress.get("sources") or []
    if not sources:
        return {}
    end = sources[0].get("endOffset")
    if end is None:
        return {}
    if isinstance(end, str):
        # the Python data source renders offsets as a python-repr dict
        # ("{'0': 50}"), not JSON — try both
        try:
            end = json.loads(end)
        except ValueError:
            import ast

            try:
                end = ast.literal_eval(end)
            except (ValueError, SyntaxError):
                return {}
    if not isinstance(end, dict):
        return {}
    return {str(k): int(v) for k, v in end.items()}


def stop_when_complete(
    query,
    topic,
    poll_interval: float = 0.25,
    timeout: float | None = 120.0,
) -> bool:
    """Block until ``topic`` is marked complete, drain the stream, then
    stop ``query``. Returns True when the query terminated after a full
    drain; False on timeout (query left running).

    Drain proof: after processAllAvailable(), the source's committed
    endOffset must equal the topic ledger for every partition — the
    same "cursor == total_events" check the reference's feed loop makes
    before sending NoMoreEvents
    (/root/reference/src/DefaultPartitionManager.cpp:415-504)."""
    deadline = None if timeout is None else time.time() + timeout
    while query.isActive:
        if topic._refresh().completed:
            break
        if deadline is not None and time.time() > deadline:
            return False
        time.sleep(poll_interval)
    if not query.isActive:
        return True
    # completion flag is set: drain whatever the ledger already holds,
    # then confirm the committed range reached it. Retry until drained
    # or deadline — the query is stopped ONLY after a proven drain, so
    # False always means "timeout, query left running" per the contract
    # above (never a silently-undrained shutdown).
    while True:
        query.processAllAvailable()
        end = _end_offsets(query.lastProgress)
        if "logOffset" in end:
            # native file-source stream (read_stream fast path): the
            # end offset is Spark's file-log position, not a partition
            # map, so the ledger compare below cannot apply. The drain
            # proof here is processAllAvailable() itself: it returns
            # only once every file visible at call time is committed,
            # and the completion flag (observed BEFORE the call) means
            # producers flushed and no further file can appear — the
            # same flush-before-complete contract the ledger proof
            # assumes.
            break
        ledger = {str(p): int(n) for p, n in topic.log.next_offsets().items()}
        if all(end.get(p, 0) >= n for p, n in ledger.items()):
            break
        if deadline is not None and time.time() > deadline:
            return False
        time.sleep(poll_interval)
    query.stop()
    query.awaitTermination(30)
    # Release the manager's reference to the now-terminated query.
    # StreamingQueryManager keeps every terminated query (with its
    # IncrementalExecution plans and progress history) until
    # resetTerminated() — a long-lived session draining many topics
    # otherwise accumulates one retained query per drain (measured:
    # ~7% suite-level drag after ~50 drains in one session). This
    # helper owns the query's lifecycle (it stopped it), so the drain
    # is the right release point. Side effect, documented: terminated
    # queries the CALLER was still tracking via awaitAnyTermination()
    # are cleared too — Spark offers no single-query release.
    try:
        topic.driver.spark.streams.resetTerminated()
    except Exception:  # noqa: BLE001 — hygiene only, never fail a drain
        pass
    return True
