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
                    vpu_gops: float = 4000.0) -> dict:
    """Analytic per-call bounds for a batched limb NTT (uint32)."""
    n = 1 << logn
    bytes_moved = 2 * 4 * n * nlimbs          # read + write
    ops = logn * n * nlimbs * 22              # rolls/selects/shoup per stage
    return dict(
        memory_us=bytes_moved / (hbm_gbps * 1e3),
        compute_us=ops / (vpu_gops * 1e3),
    )


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
