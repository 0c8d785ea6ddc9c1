"""Drain-proofing tests for bench.py (BENCH_r04 post-mortem).

The round-4 driver bench died with RESOURCE_EXHAUSTED during jit lowering
while the chip was in its post-run drain state. These tests fault-inject
that failure on CPU and assert the retry machinery recovers, and that the
artifact is a parseable JSON line even on final failure (VERDICT r4 #1).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _no_sleep(_s):
    pass


def test_retry_recovers_from_transient():
    calls = []

    def build():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return "compiled"

    out = bench.with_retry(
        build, budget_s=600.0, probe=lambda: True, sleep=_no_sleep
    )
    assert out == "compiled"
    assert len(calls) == 2


def test_retry_waits_for_probe_health():
    probe_results = iter([False, False, True])
    calls = []

    def build():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("UNAVAILABLE: tunnel draining")
        return 42

    sleeps = []
    out = bench.with_retry(
        build,
        budget_s=600.0,
        probe=lambda: next(probe_results),
        sleep=sleeps.append,
    )
    assert out == 42
    assert len(calls) == 2
    assert len(sleeps) == 3  # backed off until the third probe passed
    assert sleeps[1] > sleeps[0]  # exponential backoff


def test_retry_propagates_non_transient():
    calls = []

    def build():
        calls.append(1)
        raise ValueError("a real bug, not the tunnel")

    with pytest.raises(ValueError):
        bench.with_retry(build, budget_s=600.0, probe=lambda: True, sleep=_no_sleep)
    assert len(calls) == 1  # no retry on real bugs


def test_retry_budget_exhausted_raises():
    def build():
        raise RuntimeError("RESOURCE_EXHAUSTED: still draining")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.with_retry(build, budget_s=0.0, probe=lambda: True, sleep=_no_sleep)


def test_is_transient_markers():
    assert bench.is_transient(RuntimeError("RESOURCE_EXHAUSTED: x"))
    assert bench.is_transient(RuntimeError("backend UNAVAILABLE"))
    assert not bench.is_transient(ValueError("shape mismatch"))


def test_main_emits_error_json_on_final_failure(capsys):
    def failing_run():
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    rc = bench.main(run=failing_run)
    assert rc == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    record = json.loads(line)  # the artifact must parse either way
    assert record["metric"] == "online_pso_pairs_per_sec_per_chip"
    assert record["value"] is None
    assert "RESOURCE_EXHAUSTED" in record["error"]


def test_main_passes_through_success_record(capsys):
    record_in = {"metric": "online_pso_pairs_per_sec_per_chip", "value": 16.0}
    rc = bench.main(run=lambda: record_in)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == record_in


def test_faulted_first_compile_still_emits_valid_json(capsys):
    """End-to-end shape of the r4 failure: the first compile dies in the
    drain state, the retry path recovers, main prints one valid JSON line."""
    attempts = []

    def flaky_compile():
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return {"metric": "online_pso_pairs_per_sec_per_chip", "value": 15.9}

    def run():
        return bench.with_retry(
            flaky_compile, budget_s=600.0, probe=lambda: True, sleep=_no_sleep
        )

    rc = bench.main(run=run)
    assert rc == 0
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["value"] == 15.9
    assert len(attempts) == 2
