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


def test_meter_disables_without_proc_children(monkeypatch):
    """ADVICE r9: on a kernel without CONFIG_PROC_CHILDREN the tree
    walk loses the JVM's jiffies and every query would be stamped
    hot — the meter must self-disable to the -1 unknown stamp."""
    import builtins

    real_open = builtins.open

    def fake_open(path, *a, **kw):
        if isinstance(path, str) and path.endswith("/children"):
            raise OSError("no CONFIG_PROC_CHILDREN")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", fake_open)
    meter = ExternalLoadMeter()
    assert not meter.ok
    assert meter.external_cores(meter.start()) == -1.0


def test_retime_trigger_scales_with_duration():
    """VERDICT r9 item 5: sub-second queries re-time at ~1 external
    core; long queries keep the historical burst threshold."""
    from bench import retime_trigger

    assert retime_trigger(0.5, 8.0) == 1.0
    assert retime_trigger(0.9, 8.0) == 1.0
    assert retime_trigger(5.0, 8.0) == 4.0
    assert retime_trigger(10.0, 8.0) == 8.0
    assert retime_trigger(60.0, 8.0) == 8.0
    # degenerate hosts: trigger never exceeds the global threshold
    assert retime_trigger(60.0, 4.0) == 4.0


def test_output_lines_tail_always_parseable():
    """VERDICT r9 item 2: the driver keeps the last 2000 bytes of
    stdout; the LAST printed line must be a complete JSON record
    with the headline contract fields, under that budget, no matter
    how large the stamped record grows."""
    import json

    stamped = {
        "metric": "headline_queries_total_time",
        "value": 15.1,
        "unit": "sec",
        "queries": {f"query_name_{i}": 1.2345 for i in range(17)},
        "query_medians": {f"query_name_{i}": 1.3 for i in range(17)},
        "extended": {f"ext_{i}": 5.0 for i in range(8)},
        "sf": 0.1,
        "query_ext_cores": {f"query_name_{i}": 0.1 for i in range(17)},
        "extended_ext_cores": {f"ext_{i}": 0.1 for i in range(8)},
        "ext_cores_threshold": 8.0,
        "retimed": [],
    }
    from bench import output_lines

    lines = output_lines(stamped)
    assert json.loads(lines[0]) == stamped  # full record still emitted
    tail = json.loads(lines[-1])
    assert len(lines[-1]) <= 1900
    assert tail["metric"] == "headline_queries_total_time"
    assert tail["value"] == 15.1 and tail["unit"] == "sec"
    assert tail["sf"] == 0.1 and len(tail["queries"]) == 17
    # round 12 (VERDICT r11 item 3): the extended tier rides the
    # compact line — additions-only, prior keys untouched
    assert tail["extended"] == stamped["extended"]

    # pathological growth: per-query map alone larger than the tail
    # budget -> extended sheds first, then queries collapse to a
    # count; contract fields survive
    huge = dict(stamped, queries={f"very_long_query_name_{i}": 1.2345
                                  for i in range(300)})
    tail = json.loads(output_lines(huge)[-1])
    assert len(json.dumps(tail)) <= 1900
    assert tail["value"] == 15.1 and tail["queries"] == {"n": 300}
    assert tail["extended"] == {"n": 8}

    # extended alone overflowing sheds extended but keeps the full
    # headline map (the pre-round-12 contract exactly)
    ext_huge = dict(stamped, extended={f"very_long_extended_name_{i}": 5.0
                                       for i in range(300)})
    tail = json.loads(output_lines(ext_huge)[-1])
    assert len(json.dumps(tail)) <= 1900
    assert len(tail["queries"]) == 17 and tail["extended"] == {"n": 300}
