"""Collective-communication accounting from compiled HLO.

The reference has no distributed backend at all (SURVEY §5 "communication
backend: NONE"); this framework owns the scale-out layer, so it owns the
cost model too. GSPMD inserts the collectives — this module reads them
back out of the compiled (post-partitioning) HLO and prices them against
the TPU ICI, so every parallelism strategy (DP, TP, SP, FSDP, dataset-
sharded stats) ships with a measured per-step byte bill instead of a
hand-wave.

Two halves:

* ``collective_bytes(hlo_text)`` — parse the optimized HLO of a compiled
  program and bucket every cross-device op (all-reduce, all-gather,
  reduce-scatter, collective-permute, all-to-all) by PER-CHIP payload
  bytes. Post-SPMD HLO shapes are already per-partition, so an op's
  output bytes ARE the bytes each chip touches.
* ``ici_seconds(kind, bytes, axis_size)`` — project wall time for that
  payload on a v5e ICI ring using the standard bandwidth-optimal
  algorithms (all-reduce moves 2(N-1)/N x payload per chip, all-gather /
  reduce-scatter (N-1)/N x, collective-permute 1x).

Used by scripts/scaling_report.py (generates SCALING.md) and the n=16/32
mesh tests (tests/test_scaling.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional

# bytes per element for HLO dtype spellings that can appear in these models
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# `f32[8,16,128]{2,1,0}` or `bf16[4]` or `f32[]` (scalar)
_SHAPE_RE = re.compile(r"\b(\w+)\[([\d,]*)\]")

_COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# fusion/async wrappers that embed the op name but are not the op itself:
# `all-reduce-start`/`-done` pairs would double count; count only `-start`
# (the payload mover) and bare ops.
_SKIP_SUFFIXES = ("-done",)


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO result type; tuples sum their leaves."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque types carry no payload
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


@dataclass
class CollectiveStats:
    """Per-kind totals for one compiled program (per-chip bytes)."""

    bytes_by_kind: Dict[str, int] = field(default_factory=dict)
    count_by_kind: Dict[str, int] = field(default_factory=dict)

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes_by_kind.values())

    def __getitem__(self, kind: str) -> int:
        return self.bytes_by_kind.get(kind, 0)

    def counts(self, kind: str) -> int:
        return self.count_by_kind.get(kind, 0)


def collective_bytes(hlo_text: str) -> CollectiveStats:
    """Bucket every collective in optimized HLO by per-chip payload bytes.

    Operates on ``jit(f).lower(...).compile().as_text()`` — AFTER SPMD
    partitioning, so shapes are per-partition. For each collective
    instruction the RESULT type is counted (for reduce-scatter the result
    is the scattered shard, which is the per-chip payload the ring
    actually delivers; the larger input traffic is captured by the
    algorithm factor in :func:`ici_seconds`, not double-counted here).
    """
    stats = CollectiveStats()
    for line in hlo_text.splitlines():
        s = line.strip()
        # `%name = TYPE op-name(args)` — locate the op on the RHS
        eq = s.find(" = ")
        if eq < 0:
            continue
        rhs = s[eq + 3:]
        for kind in _COLLECTIVE_KINDS:
            # op name is followed by `(`; async variants append -start/-done
            m = re.search(rf"\b{kind}(-start)?(-done)?\(", rhs)
            if not m:
                continue
            if m.group(2):  # -done: completion marker, already counted
                break
            type_str = rhs[: m.start()]
            b = _shape_bytes(type_str)
            stats.bytes_by_kind[kind] = stats.bytes_by_kind.get(kind, 0) + b
            stats.count_by_kind[kind] = stats.count_by_kind.get(kind, 0) + 1
            break
    return stats


# ---------------------------------------------------------------------
# ICI projection (v5e numbers; override for other parts)
# ---------------------------------------------------------------------

# TPU v5e ICI: 2D torus, per-link ~45 GB/s each direction ("How to Scale
# Your Model" quotes 4.5e10 B/s bidirectional per link for v5e). A ring
# over one mesh axis streams both directions concurrently.
V5E_ICI_BW_PER_LINK = 4.5e10  # bytes/s, one direction
V5E_ICI_AXES = 2  # 2D torus: 2 links per axis (both directions)


def ici_seconds(
    kind: str,
    per_chip_bytes: float,
    axis_size: int,
    link_bw: float = V5E_ICI_BW_PER_LINK,
    bidirectional: bool = True,
) -> float:
    """Wall seconds for one collective of ``per_chip_bytes`` payload over a
    ring of ``axis_size`` chips.

    ``per_chip_bytes`` is the HLO RESULT size (what ``collective_bytes``
    counts). Bandwidth-optimal algorithm volumes per chip, in units of the
    result size V: all-reduce = 2(N-1)/N x V (result = full array);
    all-gather = (N-1)/N x V (result = full gathered array);
    reduce-scatter = (N-1) x V (result = one SHARD; the ring moves
    (N-1)/N of the full input = (N-1) shards); collective-permute = V;
    all-to-all(ring) = (N-1)/N x V. A bidirectional ring doubles the
    effective link bandwidth.
    """
    if axis_size <= 1:
        return 0.0
    n = axis_size
    factor = {
        "all-reduce": 2.0 * (n - 1) / n,
        "all-gather": (n - 1) / n,
        "reduce-scatter": float(n - 1),
        "collective-permute": 1.0,
        "all-to-all": (n - 1) / n,
    }[kind]
    bw = link_bw * (2.0 if bidirectional else 1.0)
    return per_chip_bytes * factor / bw


def project_step(
    stats: CollectiveStats, axis_size: int, link_bw: float = V5E_ICI_BW_PER_LINK
) -> Dict[str, float]:
    """Project per-kind and total ICI seconds for one compiled step."""
    out: Dict[str, float] = {}
    for kind, b in stats.bytes_by_kind.items():
        out[kind] = ici_seconds(kind, b, axis_size, link_bw)
    out["total"] = sum(out.values())
    return out
