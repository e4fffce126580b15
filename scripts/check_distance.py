"""Metric-artifact diagnostic: cumulative Fisher-Rao distance r(lambda)
from a saved stats npz. Parity: reference scripts/check_distance.py."""
import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--stats_path", type=str, default="stats/cifar10_metric.npz")
args = parser.parse_args()

stats = np.load(args.stats_path)
temp, metric, log_temp = stats["temp"], stats["metric"], stats["log_temp"]
idx = np.argsort(log_temp)
temp, metric, log_temp = temp[idx], metric[idx], log_temp[idx]
sqrt_g = np.sqrt(np.maximum(metric, 0))
dr = 0.5 * (sqrt_g[1:] + sqrt_g[:-1]) * np.diff(log_temp)
r = np.concatenate([[0], np.cumsum(dr)])

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

plt.figure(figsize=(10, 6))
plt.semilogx(temp, r, "r-")
plt.axvline(1e-2, color="k", linestyle="--", label="T=1e-2")
plt.xlabel("Temperature T"); plt.ylabel("Distance r(0, sigma)")
plt.grid(which="both", alpha=0.3); plt.legend()
plt.savefig("debug_distance.png")

i = np.abs(temp - 1e-2).argmin()
print(f"At T={temp[i]:.2e}, r={r[i]:.4f}")
print(f"Max r={r[-1]:.4f}")
print(f"Ratio r(1e-2)/r_max = {r[i]/r[-1]:.4f}")
