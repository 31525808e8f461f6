#!/usr/bin/env python
"""Overlay binned samples on the analytic density from a
``distribution.txt`` written by tools/test_distribution.py — the analog of
the reference's tools/plot_distribution.py."""

import argparse

import numpy as np


def read_distribution_file(path):
    samples, density = [], []
    section = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("# === samples"):
                section = "samples"
                continue
            if line.startswith("# === density"):
                section = "density"
                continue
            if line.startswith("#") or not line.strip():
                continue
            vals = [float(v) for v in line.split()]
            if section == "samples":
                samples.append(vals[0])
            elif section == "density":
                density.append(vals)
    return np.asarray(samples), np.asarray(density)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default="distribution.txt")
    ap.add_argument("--output", default="distribution.pdf")
    ap.add_argument("--bins", type=int, default=64)
    args = ap.parse_args()

    samples, density = read_distribution_file(args.input)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(samples, bins=args.bins, density=True, alpha=0.5,
            label=f"samples (n={samples.size})")
    ax.plot(density[:, 0], density[:, 1], "r-", lw=2, label="density")
    ax.set_xlabel("x")
    ax.set_ylabel("p(x)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
