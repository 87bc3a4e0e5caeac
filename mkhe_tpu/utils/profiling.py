"""Lightweight tracing/profiling utilities (SURVEY.md §5.1: the reference
has none; the TPU build provides op-level timing with honest device
synchronization plus analytic roofline estimates for the hot kernels)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class Timer:
    """Accumulates wall-clock per labelled region, with host-fetch
    synchronization (block_until_ready is not reliably blocking through
    the axon relay)."""
    records: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def region(self, label: str, sync_out=None):
        t0 = time.perf_counter()
        yield
        if sync_out is not None:
            _ = int(np.asarray(sync_out).ravel()[0])
        self.records.setdefault(label, []).append(
            time.perf_counter() - t0)

    def summary(self) -> str:
        lines = []
        for k, v in sorted(self.records.items()):
            lines.append(f"{k}: n={len(v)} mean={np.mean(v)*1e3:.3f}ms "
                         f"min={np.min(v)*1e3:.3f}ms")
        return "\n".join(lines)


def ntt_roofline_us(logn: int, nlimbs: int, hbm_gbps: float = 800.0,
                    vpu_gops: float = 3400.0) -> dict:
    """Analytic per-call bounds for a batched limb NTT (uint32).

    Op model (round-4 kernel, ops/ntt_pallas.py): sloppy-Shoup lazy
    butterflies — big-h sliced stages ~8 VPU ops/element, small-h roll
    stages ~17, twist ~12, final csubs 4. The effective u32 VPU rate
    (3.4 T ops/s default) back-solves from the measured ~1.0 us/limb at
    logN=14 (BENCH_NOTES r3/r4); the r1 default of 4 T with a 22-op/stage
    model gave a stale ~5 us/limb figure (VERDICT r3)."""
    n = 1 << logn
    nbig = max(logn - 7, 0)
    nsmall = min(logn, 7)
    bytes_moved = 2 * 4 * n * nlimbs          # read + write
    ops = n * nlimbs * (nbig * 8 + nsmall * 17 + 16)
    return dict(
        memory_us=bytes_moved / (hbm_gbps * 1e3),
        compute_us=ops / (vpu_gops * 1e3),
    )


def roofline_report(logn: int, nlimbs: int, measured_us: float) -> str:
    """One-line model-vs-measured summary for the probes."""
    r = ntt_roofline_us(logn, nlimbs)
    floor = max(r["memory_us"], r["compute_us"])
    return (f"roofline logN={logn} x{nlimbs} limbs: memory "
            f"{r['memory_us']:.1f} us, compute {r['compute_us']:.1f} us "
            f"-> floor {floor:.1f} us; measured {measured_us:.1f} us "
            f"({measured_us / max(floor, 1e-9):.2f}x of floor)")


def mulrelin_op_counts(logn: int, lq: int, lp: int, beta: int, parties: int
                       ) -> dict:
    """Operation inventory of one multi-key mult+relin (square case), for
    comparing measured time against the model."""
    n = 1 << logn
    lqp = lq + lp
    ntts = (parties * beta * lqp) * 2 + (parties + 1) * lq + \
        parties * lqp * 2 + lqp
    mulaccs = (2 + 3) * parties * beta * lqp * n  # x/y agg + 3 ext products
    return dict(limb_ntts=ntts, mul_accumulate_terms=mulaccs)
