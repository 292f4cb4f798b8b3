"""Opportunistic quiet-window 8→32 long-leg scaling pair (VERDICT r3
item 9): runs ONE interleaved local[8]/local[32] pair of the full
north-rule pipeline, but only when the box is actually quiet — the
1-minute load average is sampled immediately before each leg and the
pair is abandoned (exit 3) if background load is above the threshold,
so a published pair is quiet *by construction*, not by hope.

Reuses scaling_report.py's RUN_SNIPPET/run_at; does NOT overwrite
BENCH.md — appends one JSON line per attempt to scripts/quiet_pairs.jsonl
for manual curation into BENCH.md.

Usage: SCALING_INPUT=<transcripts parquet> python scripts/quiet_pair.py
Env: QUIET_MAX_LOAD (default 2.0).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_report import run_at  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "quiet_pairs.jsonl")

_HZ = os.sysconf("SC_CLK_TCK")


def _box_cpu_s() -> dict:
    """Whole-box cumulative CPU-seconds by class (/proc/stat line 1):
    busy (everything except idle+iowait+steal), steal (hypervisor gave
    our vCPUs to another VM), iowait, idle.  Steal is reported
    separately because on this shared VM it is the invisible neighbor:
    processes never show it, but a 32-way leg can lose 4-15 cores to
    it."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    steal = v[7] if len(v) > 7 else 0
    return {"busy": (sum(v) - v[3] - v[4] - steal) / _HZ,
            "steal": steal / _HZ,
            "iowait": v[4] / _HZ,
            "idle": v[3] / _HZ}


def _own_children_s() -> float:
    """CPU-seconds consumed by our reaped children (the Spark leg
    subprocesses run via subprocess.run, so they are fully accounted
    here by the time run_at returns)."""
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    return ru.ru_utime + ru.ru_stime


class _DescendantCpuSampler(threading.Thread):
    """Accumulates CPU-seconds of OUR process subtree by sampling
    /proc/*/stat once a second and classifying each pid by walking its
    ppid chain up to our pid.  Needed because py4j may not reap the
    JVM child when a leg's Python driver exits, in which case that
    JVM's CPU never lands in RUSAGE_CHILDREN and would be mistaken for
    neighbor load.  Error bound: ≤1 s of CPU per short-lived process
    (dies between samples), negligible on 60–200 s legs whose JVM
    lives the whole leg."""

    def __init__(self):
        super().__init__(daemon=True)
        self._halt = threading.Event()
        self._first = {}   # pid -> first-seen cumulative cpu (ours only)
        self._last = {}    # pid -> last-seen cumulative cpu (ours only)
        self._done = {}    # pids that vanished: their final contribution
        self._mine = os.getpid()
        # 1 Hz timeline of (epoch, own_cpu_s, box busy/steal/iowait
        # cumulative) so a storm can be located in time, not just
        # averaged over the leg
        self.timeline = []

    def _ppid_chain_hits_us(self, pid: int, ppids: dict) -> bool:
        seen = 0
        while pid > 1 and seen < 64:
            if pid == self._mine:
                return True
            pid = ppids.get(pid, 0)
            seen += 1
        return False

    def _sample(self):
        stats = {}
        ppids = {}
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat") as f:
                    raw = f.read()
            except OSError:
                continue
            # comm may contain spaces/parens: split after the LAST ')'
            rp = raw.rindex(")")
            fields = raw[rp + 2:].split()
            pid = int(ent)
            ppids[pid] = int(fields[1])          # field 4 (ppid)
            stats[pid] = (int(fields[11]) + int(fields[12])) / _HZ  # utime+stime
        for pid, cpu in stats.items():
            if pid in self._first:
                self._last[pid] = cpu
            elif self._ppid_chain_hits_us(pid, ppids):
                self._first[pid] = cpu
                self._last[pid] = cpu
        for pid in list(self._first):
            if pid not in stats:  # vanished: bank its contribution
                self._done[pid] = self._done.get(pid, 0.0) + \
                    (self._last.pop(pid) - self._first.pop(pid))
        box = _box_cpu_s()
        self.timeline.append((round(time.time(), 1), round(self._total_nolock(), 1),
                              round(box["busy"], 1), round(box["steal"], 1),
                              round(box["iowait"], 1)))

    def _total_nolock(self) -> float:
        live = sum(self._last[p] - self._first[p] for p in self._first)
        return live + sum(self._done.values())

    def run(self):
        while not self._halt.is_set():
            try:
                self._sample()
            except Exception:
                pass
            self._halt.wait(1.0)

    def total(self) -> float:
        self._halt.set()
        self.join(timeout=5)
        return self._total_nolock()


def _metered_run(cores: int, src: str) -> dict:
    """run_at + neighbor-CPU accounting: whole-box busy jiffies minus
    our own subtree's CPU over the leg's wall time = average CPU cores
    burned by OTHER tenants during the leg. The load-average entry gate
    (sampled once, 1-min EMA) cannot see a storm that starts mid-leg;
    this measures it directly, so a published pair is provably
    unstormed rather than hopefully so.  'Own' CPU is the max of the
    reaped-children rusage and the sampled /proc subtree (the latter
    catches an unreaped JVM, the former catches sampler blind spots)."""
    sampler = _DescendantCpuSampler()
    sampler.start()
    box0, own0, w0 = _box_cpu_s(), _own_children_s(), time.time()
    r = run_at(cores, src)
    wall = time.time() - w0
    box1 = _box_cpu_s()
    own = max(_own_children_s() - own0, sampler.total())
    busy = box1["busy"] - box0["busy"]
    r["own_cores_avg"] = round(own / wall, 2)
    r["neighbor_cores_avg"] = round(max(0.0, busy - own) / wall, 2)
    r["steal_cores_avg"] = round((box1["steal"] - box0["steal"]) / wall, 2)
    r["iowait_cores_avg"] = round((box1["iowait"] - box0["iowait"]) / wall, 2)
    r["idle_cores_avg"] = round((box1["idle"] - box0["idle"]) / wall, 2)
    # 10 s-bucket timeline of [t_rel, own, neighbor, steal] core-rates:
    # locates a storm in time (and, with the leg's phase epochs, in
    # pipeline phase) instead of smearing it over the whole leg
    tl = sampler.timeline
    buckets = []
    for i in range(1, len(tl)):
        t0s, o0, b0, s0, _ = tl[i - 1]
        t1s, o1, b1, s1, _ = tl[i]
        dt = t1s - t0s
        if dt <= 0:
            continue
        own_r = (o1 - o0) / dt
        nb_r = max(0.0, (b1 - b0) / dt - own_r)
        buckets.append((int(t1s - w0), own_r, nb_r, (s1 - s0) / dt))
    # fixed 10-sample chunks (samples are ~1 s apart)
    out = []
    for i in range(0, len(buckets), 10):
        chunk = buckets[i:i + 10]
        out.append([chunk[-1][0],
                    round(sum(c[1] for c in chunk) / len(chunk), 1),
                    round(sum(c[2] for c in chunk) / len(chunk), 1),
                    round(sum(c[3] for c in chunk) / len(chunk), 1)])
    r["timeline_10s"] = out
    r["meter_epoch0"] = round(w0, 1)  # t_rel=0 reference; leg phases carry
    # absolute epoch_start/epoch_dtw_start/epoch_end for alignment
    return r


def main() -> int:
    src = os.environ.get("SCALING_INPUT")
    if not src or not os.path.exists(src):
        print("SCALING_INPUT missing", file=sys.stderr)
        return 2
    max_load = float(os.environ.get("QUIET_MAX_LOAD", "2.0"))
    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "max_load": max_load, "legs": {}}
    for cores in (8, 32):
        load = os.getloadavg()[0]
        if load > max_load:
            rec["abandoned"] = f"load {load:.2f} before local[{cores}] leg"
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            return 3
        r = _metered_run(cores, src)
        r["load_before"] = round(load, 2)
        r["load_after"] = round(os.getloadavg()[0], 2)
        rec["legs"][str(cores)] = r
        print(json.dumps(r), flush=True)
        # let our own leg's load decay so the next sample sees background
        # (1-min EMA from ~8 needs ~90 s to fall under a 2.0 gate)
        if cores == 8:
            time.sleep(90)
    l8, l32 = rec["legs"]["8"], rec["legs"]["32"]
    rec["eff_total"] = round((l8["t_total"] / l32["t_total"]) / 4, 3)
    rec["eff_dtw"] = round((l8["t_dtw"] / l32["t_dtw"]) / 4, 3)
    rec["eff_rollup"] = round((l8["t_rollup"] / l32["t_rollup"]) / 4, 3)
    # Steal budget scales with our own width: this VM's hypervisor
    # quota shaves a roughly fixed FRACTION of whatever we run
    # (measured: 32-thread burn on an idle box = 27.5 own + 4.1 steal;
    # metered legs show ~0.1×cores steady steal at 8 and 32 alike).
    # Steady quota-steal is the box's real full-width capacity, not a
    # neighbor storm; a storm shows as steal well above the quota line
    # or as neighbor-process cores.
    max_neighbor = float(os.environ.get("QUIET_MAX_NEIGHBOR", "1.0"))
    rec["clean"] = all(
        leg["neighbor_cores_avg"] <= max_neighbor
        and leg["steal_cores_avg"] <= 1.0 + 0.125 * leg["cores"]
        for leg in (l8, l32))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
