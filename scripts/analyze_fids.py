"""FID results analysis: tables by (schedule, n_steps) with best min_temp,
like the reference's analyze_fids.ipynb, as a CLI.
"""
import argparse
import glob

import pandas as pd


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fid_dir", default="fid")
    parser.add_argument("--csv", default=None, help="specific csv (default: all)")
    args = parser.parse_args()

    paths = [args.csv] if args.csv else sorted(glob.glob(f"{args.fid_dir}/*.csv"))
    if not paths:
        print(f"no FID csv files under {args.fid_dir}/")
        return
    for path in paths:
        df = pd.read_csv(path)
        print(f"=== {path} ===")
        best = df.loc[df.groupby(["schedule", "n_steps"])["fid"].idxmin()]
        table = best.pivot(index="n_steps", columns="schedule", values="fid")
        print(table.round(3).to_string())
        print()
        if "min_temp" in df.columns and df["min_temp"].nunique() > 1:
            print("best min_temp per (schedule, n_steps):")
            print(
                best.pivot(index="n_steps", columns="schedule", values="min_temp")
                .to_string()
            )
            print()


if __name__ == "__main__":
    main()
