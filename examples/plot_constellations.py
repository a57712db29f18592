"""Constellation plots (counterpart of commpy/examples/plotConsModem.py).

Saves PNGs next to this script (headless-safe Agg backend).
Run:  python examples/plot_constellations.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from commpy_tpu.modulation import PSKModem, QAMModem  # noqa: E402


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for ax, modem, title in (
        (axes[0], PSKModem(8), "8-PSK"),
        (axes[1], QAMModem(16), "16-QAM"),
        (axes[2], QAMModem(64), "64-QAM"),
    ):
        c = modem.constellation
        ax.scatter(c.real, c.imag, s=18)
        for idx, pt in enumerate(c):
            ax.annotate(
                format(idx, f"0{modem.num_bits_symbol}b"),
                (pt.real, pt.imag),
                textcoords="offset points",
                xytext=(4, 4),
                fontsize=6,
            )
        ax.set_title(f"{title} (Gray labels)")
        ax.grid(alpha=0.3)
        ax.set_aspect("equal")
    out = os.path.join(here, "constellations.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print("saved", out)


if __name__ == "__main__":
    main()
