"""Ordered multiprocessing runner.

Capability parity with ``/root/reference/utils/multiprocess_utils.py``:
spawn-context worker pool, round-robin argument striping, results yielded in
submission order.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Iterable, List


def _worker(fn, args_queue, results_queue, init_ctx_func):
    ctx = init_ctx_func() if init_ctx_func is not None else None
    while True:
        item = args_queue.get()
        if item is None:
            return
        job_idx, args = item
        try:
            if ctx is not None:
                res = fn(*args, ctx=ctx)
            else:
                res = fn(*args)
            results_queue.put((job_idx, res))
        except KeyboardInterrupt:
            return
        except Exception as e:  # noqa: BLE001 — report, keep pool alive
            import traceback

            traceback.print_exc()
            results_queue.put((job_idx, None))


def chunked_multiprocess_run(
    fn: Callable, args: List, num_workers: int, q_max_size: int = 1000,
    init_ctx_func=None,
):
    """Run ``fn(*args[i])`` across workers, yielding results in order."""
    num_jobs = len(args)
    if num_jobs == 0:
        return
    ctx = mp.get_context("spawn")
    args_queues = [ctx.Queue(maxsize=q_max_size // num_workers) for _ in range(num_workers)]
    results_queue = ctx.Queue(maxsize=q_max_size)
    workers = []
    for i in range(num_workers):
        p = ctx.Process(
            target=_worker, args=(fn, args_queues[i], results_queue, init_ctx_func),
            daemon=True,
        )
        p.start()
        workers.append(p)
    # round-robin striping (feeding thread not needed for bounded workloads)
    import threading

    def feed():
        for job_idx, a in enumerate(args):
            args_queues[job_idx % num_workers].put((job_idx, a))
        for q in args_queues:
            q.put(None)

    t = threading.Thread(target=feed, daemon=True)
    t.start()

    buffer = {}
    next_idx = 0
    received = 0
    while received < num_jobs:
        job_idx, res = results_queue.get()
        buffer[job_idx] = res
        received += 1
        while next_idx in buffer:
            yield buffer.pop(next_idx)
            next_idx += 1
    for p in workers:
        p.join()
