"""One precision policy for every Gram-expansion op.

The squared-distance expansion ``||x||^2 - 2 x.y + ||y||^2`` is
cancellation-prone: on TPU, XLA lowers a default-precision fp32 matmul to
bf16 MXU passes, whose O(1e-2) relative Gram error becomes O(10) ABSOLUTE
error at CIFAR scale (||x||^2 ~ 3e3) — enough to corrupt Boltzmann
posteriors at low temperature and flip k-NN neighbor order. The reference
forced fp32 for exactly this reason (utils/distance.py:13-21,
scheduler.py:63).

All three Gram ops — the single-temperature Boltzmann op
(``ops/boltzmann.py``), the fused multi-temperature sweep
(``ops/boltzmann_sweep.py``), and on-device k-NN (``ops/knn.py``) — resolve
their MXU precision here. One environment knob:

    PDM_BOLTZMANN_PRECISION = fp32 (default) | bf16_3x | bf16

- ``fp32``:    full-precision MXU operands (Precision.HIGHEST). Exact;
               ~6x the MXU passes of bf16. The default: correctness first.
- ``bf16_3x``: three bf16 passes accumulated in fp32 (hi*hi + hi*lo +
               lo*hi; Precision.HIGH). ~2^-16 relative Gram error.
- ``bf16``:    single bf16 pass (Precision.DEFAULT). Fastest, loosest.

``PDM_SWEEP_PRECISION`` still overrides for the sweep kernel specifically
(kept for round-2 compatibility); it falls back to the unified knob.

The env var is read at CALL time, not import time, so tests and scripts can
flip it per-case.
"""

from __future__ import annotations

import os

from jax import lax

_VALID = ("fp32", "bf16_3x", "bf16")


def boltzmann_precision_mode(override: str | None = None) -> str:
    """Resolve the Gram precision mode: explicit override > env > fp32."""
    mode = override or os.environ.get("PDM_BOLTZMANN_PRECISION", "fp32")
    if mode not in _VALID:
        raise ValueError(
            f"PDM_BOLTZMANN_PRECISION={mode!r}; expected one of {_VALID}"
        )
    return mode


def sweep_precision_mode(override: str | None = None) -> str:
    """Sweep kernel's mode: override > PDM_SWEEP_PRECISION > unified knob."""
    return boltzmann_precision_mode(
        override or os.environ.get("PDM_SWEEP_PRECISION")
    )


def xla_dot_precision(mode: str) -> lax.Precision:
    """The lax.Precision that gives fp32 operands the same MXU lowering as
    the named mode (TPU: DEFAULT=bf16, HIGH=bf16_3x, HIGHEST=fp32)."""
    return {
        "fp32": lax.Precision.HIGHEST,
        "bf16_3x": lax.Precision.HIGH,
        "bf16": lax.Precision.DEFAULT,
    }[boltzmann_precision_mode(mode)]
