"""Copy primitive retry/backoff semantics (ST9/X10 —
BatchUtils.java:50-53's bounded attempts, unit level)."""

from __future__ import annotations

import threading
import time

from reair_spark.copy import COPY_ATTEMPTS, _copy_one


def test_permanent_failure_exhausts_attempts(tmp_path):
    t0 = time.monotonic()
    out = _copy_one(str(tmp_path / "missing"), str(tmp_path / "dest"), 10, 1000)
    elapsed = time.monotonic() - t0
    assert out[2] == "FAILED"
    assert "FileNotFoundError" in out[4]
    # backoff actually ran: sum of 0.05 * 2^i for all attempts
    assert elapsed >= sum(0.05 * (2 ** i) for i in range(COPY_ATTEMPTS)) * 0.8


def test_transient_failure_recovers(tmp_path):
    """src appears during the first backoff window → a later attempt
    succeeds; the result is indistinguishable from a clean copy."""
    src, dest = str(tmp_path / "late_src"), str(tmp_path / "dest")

    def create_late():
        time.sleep(0.02)
        with open(src, "w") as fh:
            fh.write("payload")

    t = threading.Thread(target=create_late)
    t.start()
    try:
        out = _copy_one(src, dest, 7, 123456)
    finally:
        t.join()
    assert out[2] == "COPIED"
    assert out[3] == 7
    assert open(dest).read() == "payload"


def test_same_size_dest_skips(tmp_path):
    src, dest = str(tmp_path / "s"), str(tmp_path / "d")
    open(src, "w").write("abc")
    open(dest, "w").write("xyz")  # same size → treated as already copied
    out = _copy_one(src, dest, 3, 1000)
    assert out[2] == "SKIPPED"
    assert open(dest).read() == "xyz"


def test_checksum_detects_corrupt_dest(tmp_path):
    """BatchUtils.java:105-117 parity: with verify_checksum, a
    same-size corrupted dest is re-copied instead of skipped."""
    src, dest = str(tmp_path / "s"), str(tmp_path / "d")
    open(src, "w").write("abc")
    open(dest, "w").write("xyz")  # same size, wrong bytes
    # default path still skips (size-only semantics preserved)
    assert _copy_one(src, dest, 3, 1000)[2] == "SKIPPED"
    out = _copy_one(src, dest, 3, 1000, verify_checksum=True)
    assert out[2] == "COPIED"
    assert open(dest).read() == "abc"
    # matching dest now skips even under checksum
    assert _copy_one(src, dest, 3, 1000, verify_checksum=True)[2] == "SKIPPED"
