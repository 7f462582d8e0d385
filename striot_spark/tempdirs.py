"""Process-lifetime temp staging dirs with atexit cleanup.

The serve/streaming queries stage replay sources, snapshot sinks, and
checkpoints under ``tempfile.mkdtemp(prefix="striot_q*")``. Within one
process those are memoized, but every FRESH process (driver sweep,
bench run, test session) minted new dirs and never removed them, so
repeated sweeps accumulated ``/tmp/striot_q*`` indefinitely (VERDICT
r12 housekeeping item 3). ``striot_mkdtemp`` keeps the per-process
isolation that makes concurrent sweeps safe (never a shared
deterministic path — a bench and a sim running side by side must not
cross-write staging) and registers ONE atexit hook that removes
everything this process created when it exits. Crashed processes can
still leave orphans; that is the accepted trade-off versus the
alternative of GC-ing other live processes' dirs by prefix, which
would corrupt a concurrent run.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def striot_mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that self-cleans at interpreter exit.

    Drop-in for every staging/checkpoint/snapshot dir whose lifetime
    is "this process's queries" — NOT for post-mortem artifact dumps
    (e.g. q93's mismatch dump), which must outlive the process.
    """
    path = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(path)
    return path


def register_tempfile(path: str) -> str:
    """Register an existing temp FILE (not dir) for the same atexit
    removal — e.g. the per-process ``striot_spark_pkg_<pid>.zip`` that
    ``addPyFile`` ships to executors: Spark copies it into its own
    file server at add time, but the original must survive the process
    (a session restart re-adds it), so deletion rides process exit."""
    _CREATED.append(path)
    return path


def cleanup_tempdirs() -> None:
    """Remove every path this process registered (dirs and files).

    Idempotent; runs automatically at exit. File removal needs no JVM,
    so ordering against Spark's own shutdown hooks is irrelevant.
    """
    import os

    while _CREATED:
        p = _CREATED.pop()
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.unlink(p)
            except OSError:
                pass


# Registered exactly once, at import: keying registration off _CREATED
# transitioning from empty re-registered the hook after every manual
# cleanup_tempdirs() drain (harmless only because cleanup is
# idempotent). cleanup_tempdirs with an empty list is a no-op, so
# import-time registration costs nothing when no dir is ever minted.
atexit.register(cleanup_tempdirs)
