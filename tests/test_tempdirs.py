"""striot_mkdtemp staging-dir lifecycle (VERDICT r12 task 6): the
serve/streaming queries' staging, snapshot, and checkpoint dirs must
not accumulate across repeated fresh-process sweeps — each process
removes everything it minted at exit.

The in-process tests monkeypatch ``_CREATED`` to a fresh list before
calling ``cleanup_tempdirs()``: the real list holds THIS test
session's memoized staging dirs (flagship/tpch ``_STAGED``,
``bucketing._LOCATION`` caches still point at them), and a mid-session
cleanup of the real list would delete dirs those caches rely on —
failing any later test that touches a staged query (ADVICE r13).
"""

from __future__ import annotations

import os
import subprocess
import sys

import striot_spark.tempdirs as tempdirs
from striot_spark.tempdirs import (
    cleanup_tempdirs,
    register_tempfile,
    striot_mkdtemp,
)


def test_mkdtemp_registers_and_cleanup_removes(monkeypatch):
    monkeypatch.setattr(tempdirs, "_CREATED", [])
    p1 = striot_mkdtemp(prefix="striot_test_lifecycle_")
    p2 = striot_mkdtemp(prefix="striot_test_lifecycle_")
    assert os.path.isdir(p1) and os.path.isdir(p2)
    assert p1 != p2  # per-call isolation: concurrent sweeps never collide
    assert p1 in tempdirs._CREATED and p2 in tempdirs._CREATED
    cleanup_tempdirs()
    assert not os.path.exists(p1) and not os.path.exists(p2)
    assert tempdirs._CREATED == []  # drained: the atexit pass finds nothing


def test_register_tempfile_removes_files_too(monkeypatch):
    """The per-process pkg zip (sources/batch.py) registers as a FILE;
    cleanup must unlink it, not only rmtree dirs."""
    import tempfile

    monkeypatch.setattr(tempdirs, "_CREATED", [])
    fd, path = tempfile.mkstemp(prefix="striot_test_file_")
    os.close(fd)
    register_tempfile(path)
    assert os.path.exists(path)
    cleanup_tempdirs()
    assert not os.path.exists(path)


def test_cleanup_leaves_other_sessions_entries_alone(monkeypatch):
    """The monkeypatched cleanup must not reach the real module list:
    entries registered before the patch survive an in-test cleanup."""
    import tempfile

    survivor = tempfile.mkdtemp(prefix="striot_test_survivor_")
    tempdirs._CREATED.append(survivor)
    try:
        monkeypatch.setattr(tempdirs, "_CREATED", [])
        doomed = striot_mkdtemp(prefix="striot_test_doomed_")
        cleanup_tempdirs()
        assert not os.path.exists(doomed)
        assert os.path.isdir(survivor)  # untouched by the patched drain
    finally:
        if survivor in tempdirs._CREATED:
            tempdirs._CREATED.remove(survivor)
        import shutil

        shutil.rmtree(survivor, ignore_errors=True)


def test_fresh_process_removes_its_staging_at_exit():
    """The accumulation scenario itself: a fresh python process mints a
    staging dir (as every driver sweep / bench run does) and the dir is
    gone once that process exits — no /tmp/striot_q* residue."""
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from striot_spark.tempdirs import striot_mkdtemp;"
            "print(striot_mkdtemp('striot_test_fresh_'))",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=True,
    )
    path = out.stdout.strip().splitlines()[-1]
    assert path.startswith("/") and "striot_test_fresh_" in path
    assert not os.path.exists(path)
