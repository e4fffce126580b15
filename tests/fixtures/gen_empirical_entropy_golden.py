"""Generate empirical_entropy_golden.npz: the reference's entropy-artifact
transformation computed with TORCH primitives, mirroring
/root/reference/scripts/compute_stats_empirical.py:56-65 operation for
operation (trapezoid pairs -> cumsum -> subtract last -> torch pad (0,1)).

The dS/dlogT input curve is the CLOSED FORM for a Gaussian prior
N(0, sigma0^2 I_d) under VP noising — the Bayes denoiser is linear and
E||x0 - x0_hat||^2 = d * sigma0^2 T / (sigma0^2 + T), so
dS/dlogT = 0.5 * d * sigma0^2 / (sigma0^2 + T) — no Monte Carlo, so both
stacks compute from identical inputs and the fixture pins ONLY the
artifact-transformation semantics (the documented one-index alignment
deviation, model_metric.py integrate_entropy_curves).

Run once; the npz is committed. Regenerate only if the contract changes:
    python tests/fixtures/gen_empirical_entropy_golden.py
"""

import os

import numpy as np
import torch


def main():
    d, sigma0_sq = 16.0, 2.0
    temp_range = torch.logspace(np.log10(1e-4), np.log10(1e2), 32)

    # closed-form dS/dlogT (float32, like the reference pipeline)
    d_entropy_d_log_temp = (
        0.5 * d * sigma0_sq / (sigma0_sq + temp_range)
    ).to(torch.float32)

    # --- reference transformation, verbatim semantics ---
    d_log_temp = temp_range[1].log() - temp_range[0].log()

    entropy = (
        0.5 * (d_entropy_d_log_temp[1:] + d_entropy_d_log_temp[:-1])
    ).cumsum(0) * d_log_temp
    entropy -= entropy[-1].item()
    entropy = torch.nn.functional.pad(entropy, (0, 1), value=0)

    sigma = temp_range.sqrt()
    rescaled_entropy = (
        0.5
        * (
            d_entropy_d_log_temp[1:] * sigma[1:]
            + d_entropy_d_log_temp[:-1] * sigma[:-1]
        )
    ).cumsum(0) * d_log_temp
    rescaled_entropy -= rescaled_entropy[-1].item()
    rescaled_entropy = torch.nn.functional.pad(rescaled_entropy, (0, 1), value=0)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "empirical_entropy_golden.npz",
    )
    np.savez(
        out,
        temp=temp_range.numpy(),
        entropy=entropy.numpy(),
        rescaled_entropy=rescaled_entropy.numpy(),
        d_entropy_d_log_temp=d_entropy_d_log_temp.numpy(),
        dim=np.float32(d),
        sigma0_sq=np.float32(sigma0_sq),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
