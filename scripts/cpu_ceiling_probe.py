"""Raw (non-Spark) parallel-scaling ceiling of this VM: the same
CPU-bound kernel (md5 over byte blocks — same instruction mix as the
MinHash stage) on N vs 4N worker PROCESSES (no GIL, no JVM, no shuffle).
Whatever efficiency THIS loses is the machine's ceiling, not Spark's or
the operator's — on a real 4N-executor cluster each executor owns its
own memory bus and hypervisor share.

Usage: python scripts/cpu_ceiling_probe.py [N] [4N] [seconds]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import sys
import time


def worker(stop_at: float, out) -> None:
    blob = b"x" * 4096
    n = 0
    h = hashlib.md5()
    while time.time() < stop_at:
        for _ in range(200):
            h = hashlib.md5(blob + n.to_bytes(8, "little"))
            n += 1
    out.put((n, h.hexdigest()[:4]))


def level(procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_at = time.time() + seconds
    ps = [mp.Process(target=worker, args=(stop_at, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get()[0] for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else n * 4
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    level(n4, 3)  # warm
    thr_n = min(level(n, seconds) for _ in range(2))
    thr_n4 = min(level(n4, seconds) for _ in range(2))
    eff = (thr_n4 / thr_n) / (n4 / n)
    print(f"raw md5 probe: N={n} {thr_n:,.0f}/s, 4N={n4} {thr_n4:,.0f}/s, "
          f"ceiling efficiency = {eff:.3f}")


if __name__ == "__main__":
    main()
