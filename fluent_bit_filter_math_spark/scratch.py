"""Per-process scratch directories for sink round-trip queries.

Several queries materialize through a filesystem sink (parquet stream
sink, custom JSON-line Python sink, Arrow-IPC foreachBatch sink) and
read the result back. They need a scratch dir that is

* **private** — earlier revisions used predictable pid-derived paths
  (``/tmp/fbm-json-sink-<pid>``) with ``makedirs(exist_ok=True)``
  after an ``ignore_errors`` rmtree; if a stale same-named dir owned
  by another user existed, the rmtree silently no-opped and the query
  read foreign files mixed into its own output (r7 ADVICE, medium).
  ``tempfile.mkdtemp`` creates a fresh mode-0700 dir we own, with an
  unpredictable suffix, so that failure mode cannot occur.
* **bounded** — a bench run re-invokes each query REPS times; one new
  mkdtemp per invocation grows disk by REPS × |output| before any
  atexit sweep fires. We therefore create ONE dir per (process, tag)
  and wipe its *contents* on each reuse, so at most a single copy of
  each sink's output exists at any time.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_DIRS: dict[str, str] = {}


def scratch_dir(tag: str) -> str:
    """Return an empty private scratch dir, stable per (process, tag).

    First call per tag: ``mkdtemp(prefix=f"fbm-{tag}-")`` + atexit
    removal. Later calls: wipe the dir's contents and return it. If a
    wipe fails (e.g. permissions changed underneath us) we fail loudly
    rather than risk reading stale output.
    """
    d = _DIRS.get(tag)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"fbm-{tag}-")
        _DIRS[tag] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        return d
    for entry in os.listdir(d):
        p = os.path.join(d, entry)
        if os.path.isdir(p) and not os.path.islink(p):
            shutil.rmtree(p)  # raises on failure: never reuse dirty scratch
        else:
            os.unlink(p)
    return d
