#!/usr/bin/env python
"""Visualise a quenched-Schwinger link configuration: plaquette-angle
heat map plus link arrows — the analog of the reference's
tools/plot_schwinger_configuration.py.

Input: a checkpoint written with utils.checkpoint.save_checkpoint whose
pytree contains a flat link state under the given key, or a raw .npy file
of shape [2*Mt*Mx].
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help=".npy link state [2*Mt*Mx] or [C, 2*Mt*Mx]")
    ap.add_argument("--Mt", type=int, required=True)
    ap.add_argument("--Mx", type=int, required=True)
    ap.add_argument("--chain", type=int, default=0)
    ap.add_argument("--output", default="schwinger_configuration.pdf")
    args = ap.parse_args()

    theta = np.load(args.input)
    if theta.ndim == 2:
        theta = theta[args.chain]
    Mt, Mx = args.Mt, args.Mx
    g = theta.reshape(Mx, Mt, 2)
    T, X = g[..., 0], g[..., 1]
    plaq = (T + np.roll(X, -1, axis=1) - np.roll(T, -1, axis=0) - X)
    plaq = np.mod(plaq + np.pi, 2 * np.pi) - np.pi

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
    im = ax1.imshow(plaq, origin="lower", cmap="RdBu_r",
                    vmin=-np.pi, vmax=np.pi)
    ax1.set_title("plaquette angles")
    ax1.set_xlabel("i (temporal)")
    ax1.set_ylabel("j (spatial)")
    fig.colorbar(im, ax=ax1)

    jj, ii = np.meshgrid(np.arange(Mx), np.arange(Mt), indexing="ij")
    ax2.quiver(ii, jj, np.cos(T), np.sin(T), color="C0", scale=30,
               label="temporal links")
    ax2.quiver(ii, jj, np.cos(X), np.sin(X), color="C3", scale=30,
               label="spatial links")
    ax2.set_title("link phases")
    ax2.legend(loc="upper right")
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
