"""striot_mkdtemp staging-dir lifecycle (VERDICT r12 task 6): the
serve/streaming queries' staging, snapshot, and checkpoint dirs must
not accumulate across repeated fresh-process sweeps — each process
removes everything it minted at exit."""

from __future__ import annotations

import os
import subprocess
import sys

from striot_spark.tempdirs import (
    _CREATED,
    cleanup_tempdirs,
    register_tempfile,
    striot_mkdtemp,
)


def test_mkdtemp_registers_and_cleanup_removes():
    before = list(_CREATED)
    p1 = striot_mkdtemp(prefix="striot_test_lifecycle_")
    p2 = striot_mkdtemp(prefix="striot_test_lifecycle_")
    assert os.path.isdir(p1) and os.path.isdir(p2)
    assert p1 != p2  # per-call isolation: concurrent sweeps never collide
    assert p1 in _CREATED and p2 in _CREATED
    cleanup_tempdirs()
    assert not os.path.exists(p1) and not os.path.exists(p2)
    assert _CREATED == []  # idempotent: the atexit pass finds nothing
    # cleanup must not have eaten dirs created before this test
    for p in before:
        assert p not in _CREATED


def test_register_tempfile_removes_files_too():
    """The per-process pkg zip (sources/batch.py) registers as a FILE;
    cleanup must unlink it, not only rmtree dirs."""
    import tempfile

    fd, path = tempfile.mkstemp(prefix="striot_test_file_")
    os.close(fd)
    register_tempfile(path)
    assert os.path.exists(path)
    cleanup_tempdirs()
    assert not os.path.exists(path)


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
