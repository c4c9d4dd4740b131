"""Driver-side overlap of INDEPENDENT Spark actions (guide §2.6).

Spark happily runs several jobs at once inside one application; actions
are only sequential because driver code calls them sequentially. The
lifecycle trajectories here (index create/maintain, multi-table
exactly-once sinks) issue several *independent* actions back to back —
appends/compacts/vacuums on DISTINCT commit-log tables, or the two
sides of a symmetric-difference pin — and each such action leaves most
of `local[32]` idle during its scheduling tail and driver-side commit.
Submitting them from a small thread pool lets one job's tasks back-fill
cores freed by another's tail (measured on `_lsh_index_create`: the
three-table creation drops ~2x wall, same committed bytes).

Scope rule, enforced at every call site: only actions with NO data or
commit-log dependency on each other may be overlapped. Same-table
commits stay strictly serial (the rebase/conflict machinery is not a
license to race versions we control), and any read that pins a version
sampled before the overlap is immune to it by construction (commit-log
reads resolve their file list from the pinned log entry, and appends
never remove files).

Plain worker threads (not InheritableThread) are deliberate: these
thunks run actions, not configuration, and per the Spark docs a plain
pool is sufficient for concurrent job submission; job-description
inheritance is cosmetic here.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

__all__ = ["overlap"]


def overlap(*thunks: Callable[[], Any], max_workers: int | None = None) -> list:
    """Run independent zero-arg thunks concurrently; return their
    results in call order.

    All thunks are allowed to settle before any failure is re-raised
    (the FIRST failure, in call order), so a raised pin never leaves a
    sibling append running into a torn-down scratch dir behind it.
    """
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    results: list[Any] = [None] * len(thunks)
    errs: list[BaseException] = []
    with ThreadPoolExecutor(
        max_workers=max_workers or min(8, len(thunks))
    ) as pool:
        futures = [pool.submit(t) for t in thunks]
        for i, fut in enumerate(futures):
            try:
                results[i] = fut.result()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                errs.append(exc)
    if errs:
        # An exiting signal (KeyboardInterrupt/SystemExit) takes
        # precedence over an ordinary sibling failure; otherwise the
        # FIRST failure in call order is raised, with every later
        # failure attached as a note so multi-failure overlaps keep
        # their diagnostics (ADVICE r16).
        primary = next(
            (
                e
                for e in errs
                if isinstance(e, (KeyboardInterrupt, SystemExit))
            ),
            errs[0],
        )
        for e in errs:
            if e is not primary:
                primary.add_note(
                    f"overlap sibling also failed: {type(e).__name__}: {e}"
                )
        raise primary
    return results
