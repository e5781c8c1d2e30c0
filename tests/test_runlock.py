"""Workdir run lock (utils/runlock.py): a second trainer on a live
workdir must fail fast — two trainers sharing one workdir tear
metrics.jsonl and race orbax saves (observed corruption mode, round 4).
Covers: exclusivity, explicit release, kernel release on SIGKILL (the
crash-resume guarantee), and the train() integration."""

import dataclasses
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from locate_tpu.train.loop import train
from locate_tpu.utils.runlock import RunLock


def test_exclusive_and_release(tmp_path):
    wd = str(tmp_path / "run")
    lock = RunLock.acquire(wd)
    with pytest.raises(RuntimeError, match="locked by a live training"):
        RunLock.acquire(wd)
    lock.release()
    lock2 = RunLock.acquire(wd)  # free again after release
    lock2.release()
    lock2.release()  # idempotent


def test_error_names_the_holder(tmp_path):
    wd = str(tmp_path / "run")
    lock = RunLock.acquire(wd)
    with pytest.raises(RuntimeError, match=str(os.getpid())):
        RunLock.acquire(wd)
    lock.release()


def test_sigkill_releases(tmp_path):
    """flock is kernel state: a SIGKILLed holder frees the lock with no
    stale-file cleanup — resume after a crash must not be wedged."""
    wd = str(tmp_path / "run")
    child = subprocess.Popen(
        [sys.executable, "-c", textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
            from locate_tpu.utils.runlock import RunLock
            lock = RunLock.acquire({wd!r})  # hold the reference: GC of the
            # lock object would close the fd and release the flock
            print("HELD", flush=True)
            time.sleep(60)
        """)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert child.stdout.readline().strip() == "HELD"
        with pytest.raises(RuntimeError):
            RunLock.acquire(wd)
        os.kill(child.pid, signal.SIGKILL)
        child.wait(timeout=30)
        deadline = time.time() + 10
        while True:  # release is at process teardown; allow a beat
            try:
                lock = RunLock.acquire(wd)
                break
            except RuntimeError:
                if time.time() > deadline:
                    raise
                time.sleep(0.2)
        lock.release()
    finally:
        if child.poll() is None:
            child.kill()
        child.wait()


def test_train_refuses_locked_workdir(tiny_config, tmp_path):
    cfg = dataclasses.replace(tiny_config, workdir=str(tmp_path / "run"))
    lock = RunLock.acquire(cfg.workdir)
    with pytest.raises(RuntimeError, match="locked by a live training"):
        train(cfg, total_steps=2)
    lock.release()
    # released: the same workdir now trains, and train() releases on
    # return so back-to-back runs (the resume pattern) keep working
    state = train(cfg, total_steps=2)
    assert int(state.step) == 2
    state = train(cfg, total_steps=4)
    assert int(state.step) == 4
    lock = RunLock.acquire(cfg.workdir)  # free after train() returns
    lock.release()
