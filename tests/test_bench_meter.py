"""Tests for bench.py's ExternalLoadMeter — the jiffy-delta meter
that certifies each recorded bench sample against external load.
The assertions here are load-independent (they validate what the
meter ATTRIBUTES, not how busy the host happens to be), so they
cannot flap under co-tenant bursts."""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ExternalLoadMeter, _sys_busy_jiffies, _tree_cpu_jiffies


def _burn(seconds: float) -> None:
    end = time.time() + seconds
    x = 0
    while time.time() < end:
        x += 1


def test_meter_counts_own_burn_in_tree_not_external():
    """CPU burned by THIS process lands in the tree counter (and
    therefore not in external_cores): that is the property that lets
    the bench run flat-out on 32 threads without flagging itself."""
    meter = ExternalLoadMeter()
    if not meter.ok:
        return  # non-/proc host: meter self-disables, stamp is -1
    hz = meter.hz
    sys0, tree0 = _sys_busy_jiffies(), _tree_cpu_jiffies()
    _burn(0.6)
    sys_d = _sys_busy_jiffies() - sys0
    tree_d = _tree_cpu_jiffies() - tree0
    # we burned ≥ ~half of one core for 0.6s; the tree must see it
    assert tree_d >= 0.3 * 0.6 * hz
    # system-wide busy includes our tree (small read-skew slack)
    assert sys_d >= tree_d * 0.8


def test_meter_walks_child_processes():
    """CPU burned by a CHILD process is still in-tree — the bench's
    real work happens in the py4j-launched JVM, a child, so losing
    children would misattribute the whole bench as external."""
    meter = ExternalLoadMeter()
    if not meter.ok:
        return
    hz = meter.hz
    tree0 = _tree_cpu_jiffies()
    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time;e=time.time()+0.6\nwhile time.time()<e: pass",
        ]
    )
    p.wait()
    # child still exists as a zombie until reaped by Popen.wait(),
    # after which its jiffies are gone from /proc — so sample while
    # alive is ideal, but utime accumulates in /proc only while
    # running; measure by polling during the burn instead
    tree_after_wait = _tree_cpu_jiffies() - tree0
    p2 = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time;e=time.time()+1.0\nwhile time.time()<e: pass",
        ]
    )
    time.sleep(0.7)
    tree_d = _tree_cpu_jiffies() - tree0
    p2.wait()
    assert tree_d >= 0.3 * 0.5 * hz, (
        f"child burn invisible to the tree walk: {tree_after_wait}, {tree_d}"
    )


def test_external_cores_nonnegative_and_bounded_shape():
    """external_cores is clamped at 0, returns -1 (unknown) only on
    non-/proc hosts, and a zero-length window cannot divide by
    zero."""
    meter = ExternalLoadMeter()
    t0 = meter.start()
    time.sleep(0.1)
    ext = meter.external_cores(t0)
    if meter.ok:
        assert ext >= 0.0
    else:
        assert ext == -1.0
