"""Aggregate memory-bandwidth ceiling of the measurement box.

Each worker pins itself to one core and repeatedly copies a 128 MB
numpy array (all pages pre-touched; barrier-synchronized start); the
aggregate read+write GB/s across workers is the box's achievable
bandwidth at that core count.  This is the *platform* scaling ceiling
for any memory-touching work — no communication, no framework, no
skew — against which the pinned N-vs-4N crawl numbers must be read:
taskset partitions CPUs, but a single-socket box has one memory
complex, while N vs 4N real executors each bring their own.

Measured on this box (2026-08, exclusive):

     1 core : aggregate  8.7 GB/s   per-core 8.7
     2 cores: aggregate 20.5 GB/s   per-core 10.3
     4 cores: aggregate 51.9 GB/s   per-core 13.0
     8 cores: aggregate 93.0 GB/s   per-core 11.6
    16 cores: aggregate 92.6 GB/s   per-core 5.8

Bandwidth saturates at ~93 GB/s by 8 cores: perfectly-parallel memcpy
scales 4->16 cores at (92.6/51.9)/4 = 0.45 efficiency — the box's own
ceiling for bandwidth-bound work.  2->8 cores sits below the knee
(per-core bandwidth flat), so a pinned 2-vs-8 pair measures N-vs-4N
scaling without the single-box saturation artifact.
"""
import multiprocessing as mp
import os
import time

import numpy as np


def worker(core, q, barrier):
    os.sched_setaffinity(0, {core})
    a = np.ones(16 * 1024 * 1024, dtype=np.float64)  # 128 MB
    b = np.empty_like(a)
    np.copyto(b, a)  # touch all pages before timing
    barrier.wait()
    n = 0
    t0 = time.time()
    while time.time() - t0 < 6.0:
        np.copyto(b, a)
        n += 1
    dt = time.time() - t0
    q.put(n * a.nbytes * 2 / dt / 1e9)


def run(cores):
    q = mp.Queue()
    barrier = mp.Barrier(len(cores))
    ps = [mp.Process(target=worker, args=(c, q, barrier)) for c in cores]
    [p.start() for p in ps]
    out = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(out)


if __name__ == "__main__":
    for n in (1, 2, 4, 8, 16):
        bw = run(list(range(n)))
        print("%2d cores: aggregate %6.1f GB/s  per-core %5.1f"
              % (n, bw, bw / n))
