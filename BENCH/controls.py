#!/usr/bin/env python
"""Hardware scaling controls for the sandbox box (BENCH/BASELINE.md §caveats).

The north rule's scaling criterion is defined over N -> 4N EXECUTORS — on a
real cluster, 4x the executors bring 4x the memory controllers, LLC and
page cache. A single box cannot: every parallelism level shares one memory
subsystem, so per-core throughput degrades as more cores run, regardless of
the job under test. These three controls quantify that box ceiling so the
Spark job's measured efficiency can be read against it:

1. pure-cpu      — register-only arithmetic loop (no memory traffic):
                   isolates scheduler/frequency effects. Expected ~1.0.
2. parse-mp      — the crawl's own synth+parse+hash per-doc work driven by
                   a bare multiprocessing.Pool (no JVM, no Arrow): the
                   Python-side memory-subsystem ceiling.
3. jvm-codegen   — a pure whole-stage-codegen Spark pipeline
                   (sha256+crc32 over generated strings, no Python
                   workers): the JVM-side memory-subsystem ceiling.

Every control runs interleaved (lo, hi) pairs with a load gate, same
protocol as scaling_run.py, at BOTH the headline core pair and the
saturated 4->16 pair. Writes BENCH/controls.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = int(os.environ.get("CONTROL_PAIRS", "3"))
LOAD_GATE = float(os.environ.get("SCALING_LOAD_GATE", "2.0"))

N_HOSTS = 4096


def wait_quiet(max_wait: float = 900.0) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_run import ambient_busy_cores  # same gate as the job runs

    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait and ambient_busy_cores() >= LOAD_GATE:
        time.sleep(10)


def _synth_and_parse(i: int) -> None:
    """Mirror of bench.py's synth_fetcher + the parse/hash per-doc work."""
    sys.path.insert(0, REPO)
    h = i % N_HOSTS
    rnd = random.Random(i)
    paras = []
    for _ in range(6):
        toks = ["wort%d" % rnd.randrange(5000) for _ in range(60)]
        paras.append("<p>" + " ".join(toks) + "</p>")
    figs = (
        '<figure><img src="/img/%d_0.png"><figcaption>Bild %d.0</figcaption></figure>'
        % (h % 10000, h)
    )
    html = (
        '<html><head><meta name="author" content="Autor %d">'
        '<meta name="description" content="Teaser %d"></head><body>'
        '<time datetime="2024-03-%02dT10:00:00">x</time>'
        '<span class="headline typo-r-topline-detail">Ressort %d</span>'
        '<div class="article__body">%s%s</div></body></html>'
        % (h % 50, h, (h % 27) + 1, h % 12, "".join(paras), figs)
    )
    from german_newspaper_crawler_spark.parse.html import parse_article

    art = parse_article("https://h%d.example/a%d" % (h, i), html)
    hashlib.sha256((art.get("text") or "").encode()).hexdigest()


def _mp_worker(args):
    kind, core, n = args
    os.sched_setaffinity(0, {core})
    t0 = time.monotonic()
    if kind == "parse":
        for i in range(n):
            _synth_and_parse(i)
    else:
        x = 0
        for _ in range(n):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return time.monotonic() - t0


def _mp_rate(kind: str, cores: int, per: int) -> float:
    """Throughput of `per` work items per core across `cores` pinned procs."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(cores) as p:
        walls = p.map(_mp_worker, [(kind, c, per) for c in range(cores)])
    return cores * per / max(walls)


def _jvm_rate(cores: int, n: int) -> float:
    """Pure whole-stage-codegen rate via a fresh pinned subprocess."""
    code = (
        "import time,sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from pyspark.sql import functions as F\n"
        "from german_newspaper_crawler_spark.session import get_spark\n"
        f"spark = get_spark(master='local[{cores}]', shuffle_partitions={cores})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"df = spark.range({n}, numPartitions={4 * cores})\n"
        "q = lambda: df.select(F.sha2(F.concat(F.lit('urlprefix/article/'),"
        " F.col('id').cast('string')), 256).alias('h')).agg(F.sum(F.crc32('h'))).collect()\n"
        "q()\n"  # warm codegen + workers
        "t0 = time.monotonic(); q(); w = time.monotonic() - t0\n"
        f"print('RATE', {n} / w)\n"
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RATE")][-1]
    return float(line.split()[1])


def run_control(name: str, lo: int, hi: int, fn) -> dict:
    effs, lo_rates, hi_rates = [], [], []
    for _ in range(PAIRS):
        wait_quiet()
        rl = fn(lo)
        wait_quiet()
        rh = fn(hi)
        effs.append((rh / rl) / (hi // lo))
        lo_rates.append(rl)
        hi_rates.append(rh)
        print(json.dumps({"control": name, "lo": lo, "hi": hi,
                          "eff": round(effs[-1], 3)}),
              file=sys.stderr, flush=True)
    return {
        "control": name, "lo_cores": lo, "hi_cores": hi,
        "eff_median": round(statistics.median(effs), 3),
        "effs": [round(e, 3) for e in effs],
        "lo_rate_median": round(statistics.median(lo_rates), 1),
        "hi_rate_median": round(statistics.median(hi_rates), 1),
    }


def main():
    lo = int(os.environ.get("SCALING_N_CORES", "2"))
    results = []
    for a, b in ((lo, 4 * lo), (4, 16)):
        results.append(run_control("pure-cpu", a, b,
                                   lambda c: _mp_rate("cpu", c, 20_000_000)))
        results.append(run_control("parse-mp", a, b,
                                   lambda c: _mp_rate("parse", c, 2500)))
        results.append(run_control("jvm-codegen", a, b,
                                   lambda c: _jvm_rate(c, 24_000_000)))
    out = {"pairs_per_control": PAIRS, "results": results}
    with open(os.path.join(REPO, "BENCH", "controls.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
