"""Aggregate memory-bandwidth probe: the signer's hash-stream kernel in N
plain OS processes (no Ray). Prints GB/s aggregate at each process count —
maps this boot's linear region for picking scaling criterion levels."""
import os
import sys
import time
from multiprocessing import Process, Queue


def worker(q, seconds):
    import numpy as np

    x = np.arange(8_000_000, dtype=np.uint64)
    a = np.uint64(0x9E3779B97F4A7C15)
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        x * a + np.uint64(1)
        n += 1
    q.put(n * x.nbytes)


def run(nproc, seconds=4.0):
    q = Queue()
    ps = [Process(target=worker, args=(q, seconds)) for _ in range(nproc)]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    wall = time.time() - t0
    return total / wall / 1e9


if __name__ == "__main__":
    counts = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16,32").split(",")]
    for n in counts:
        gbps = run(n)
        print(f"{n:3d} procs: {gbps:7.2f} GB/s aggregate  ({gbps / n:5.2f}/proc)", flush=True)
