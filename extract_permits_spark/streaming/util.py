"""Small shared streaming-query helpers.

``await_or_raise`` closes the silent-timeout hole every ingest entry
had: ``StreamingQuery.awaitTermination(timeout)`` returns False on
timeout (it does NOT raise), so a hung/slow stream let callers proceed
to read a partially-written output directory as if the ingest had
finished. All registry streaming entries route through this instead.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql.streaming import StreamingQuery


def scratch_dir(prefix: str) -> str:
    """mkdtemp with guaranteed end-of-process cleanup.

    Registry entries stage stream inputs / checkpoints / outputs in a
    scratch dir; some return a DataFrame that lazily reads from it, so
    an in-function rmtree would dangle the read. atexit cleanup is the
    latest-safe point: after the driver has collected, before the
    process exits. Entries that CAN clean up earlier still do so
    explicitly (double-rmtree is harmless with ignore_errors).
    """
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def await_or_raise(q: StreamingQuery, timeout_sec: float = 300.0) -> None:
    """Block until ``q`` terminates; raise loudly if it doesn't.

    Also surfaces the query's own exception (awaitTermination re-raises
    StreamingQueryException itself, but only when the failure happened
    before the timeout window closed).
    """
    if not q.awaitTermination(timeout_sec):
        try:
            q.stop()
        except Exception:
            pass
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not terminate within "
            f"{timeout_sec}s — refusing to read a partial output"
        )
