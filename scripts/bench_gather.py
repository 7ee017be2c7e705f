"""On-chip microbench: worklist row-gather kernels (ops/cols.py).

Compares gather_rows (one DMA per row-group request) against
gather_rows_sorted (adjacent same-group requests reuse the previous DMA's
scratch slot) on a realistic worklist: a raster-order compaction of a
contiguous weak blob, where consecutive indices usually land in the same
aligned 8/16-row group — the case the dedup targets (PERF_NOTES.md:
descriptor-issue bound at ~1.6 us/DMA on v5e).

Usage: python scripts/bench_gather.py [--rows 131072 --cols 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu.ops import cols


def timeit(name, fn, n=5):
    np.asarray(fn()[:1, :4])  # compile + force completion (axon)
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn()[:1, :4])
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name:44s} {best * 1000:8.1f} ms (min of {n})")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--cols", type=int, default=640)
    ap.add_argument("--table-rows", type=int, default=320 * 1024)
    args = ap.parse_args()
    M, C, R = args.rows, args.cols, args.table_rows

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        table = jnp.asarray(rng.standard_normal((R, C)), dtype)
        # raster-order contiguous-blob worklist: sorted, mostly step-1
        start = rng.integers(0, R - M - 8)
        idx_sorted = jnp.asarray(
            np.sort(start + np.cumsum(rng.integers(0, 3, M))) % R, jnp.int32
        )
        idx_sorted = jnp.sort(idx_sorted)
        # scattered worklist: same size, random rows (no dedup possible)
        idx_rand = jnp.asarray(np.sort(rng.integers(0, R, M)), jnp.int32)

        name = np.dtype(table.dtype).name
        print(f"--- {name}: {M} rows x {C} cols from [{R},{C}] table ---")
        t_plain = timeit(
            "gather_rows (blob)", lambda: cols.gather_rows(table, idx_sorted)
        )
        t_sorted = timeit(
            "gather_rows_sorted (blob)", lambda: cols.gather_rows_sorted(table, idx_sorted)
        )
        t_sorted_rand = timeit(
            "gather_rows_sorted (scattered)", lambda: cols.gather_rows_sorted(table, idx_rand)
        )
        print(
            f"dedup speedup on contiguous blob: {t_plain / t_sorted:.2f}x; "
            f"scattered penalty vs plain: {t_sorted_rand / t_plain:.2f}x"
        )
        ok = np.allclose(
            np.asarray(cols.gather_rows_sorted(table, idx_sorted), np.float32),
            np.asarray(table, np.float32)[np.asarray(idx_sorted)],
        )
        print(f"correctness vs numpy: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
