"""DSFF sparsity -> static inference plan (the FLOP-cut cash-out).

The reference trains DSFF masks but multiplies them into dense weights at
inference (core_channel.py:427-434 — a 0/1 elementwise multiply), so its
advertised FLOP savings (README.md:20-26) are never realized as speed.
On TPU, unstructured kernel-pair masks CANNOT be realized: at density 0.2
the (in, out) bipartite mask is a random expander — no (sublane x lane)
tile of the GEMM operands is ever fully dead, and per-output-channel
gather breaks the shared contraction the systolic array needs.

ROW-granular masks (training/dsff.py granularity='row': whole fusion input
channels, shared across all outputs) ARE realizable: the alive input set
of each nest conv is one static gather, after which every fused/quadrant
block kernel contracts over ~density x fewer K rows, chained up-links emit
only consumed columns, and intra-stack convs never compute a dead channel
(models/unetpp.py sparse_plan wiring; ops/blocks.py ShiftConvBlock).

This module turns a mask pytree into that plan. Exactness: dead rows carry
w == 0 (apply_masks invariant), so skipping them changes results only by
floating-point summation order; tests/test_sparse_plan.py pins the sparse
forward against the dense masked forward.
"""
from typing import Dict, Optional, Tuple

import numpy as np

from ..training.dsff import rows_alive


def build_sparse_plan(masks: Dict[Tuple[str, ...], "np.ndarray"]
                      ) -> Optional[Tuple[Tuple[str, Tuple[int, ...]], ...]]:
    """Static sparse-inference plan from a DSFF mask pytree.

    Entries are ("<module path>", alive-row tuple) for every masked conv
    whose (in, out) mask is ROW-structured with a strict win (some rows
    dead, not all). Unstructured (kernel-pair / element) masks yield no
    entries — such checkpoints run dense, exactly like the reference.
    Returns None when no conv is realizable."""
    entries = []
    for path, m in masks.items():
        m = np.asarray(m)
        if m.ndim != 2:
            continue        # element-granular full-shape mask: no structure
        alive = rows_alive(m)
        if alive is None:
            continue
        if len(alive) == 0 or len(alive) == m.shape[0]:
            continue
        entries.append(("/".join(path[:-1]),
                        tuple(int(i) for i in alive)))
    return tuple(sorted(entries)) if entries else None


def plan_density(plan, masks) -> float:
    """Fraction of masked-conv input rows the plan keeps (diagnostic)."""
    if not plan:
        return 1.0
    by_key = {"/".join(p[:-1]): np.asarray(m) for p, m in masks.items()}
    kept = tot = 0
    for key, alive in plan:
        kept += len(alive)
        tot += by_key[key].shape[0]
    return kept / max(tot, 1)
