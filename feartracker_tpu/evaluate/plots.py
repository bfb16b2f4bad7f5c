"""OPE success-plot writer — the got10k toolkit's report-plot capability
(the reference pulled that toolkit in; its ExperimentOPE drew these).

One chart form: success rate vs IoU threshold, one line per tracker, AUC in
the legend label. Styling follows the dataviz method with its validated
reference palette (fixed categorical order, never cycled; 2px lines;
recessive grid; text in ink tokens, identity carried by the mark; a legend
whenever there are ≥2 series, title names a single series; ≤8 series — fold
extras before calling).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

# validated reference categorical order (dataviz palette.md, light mode)
SERIES_COLORS = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
SURFACE = "#fcfcfb"
INK_PRIMARY = "#0b0b0b"
INK_MUTED = "#898781"
GRID = "#e8e8e6"


def plot_success(
    curves: Dict[str, Sequence[float]],
    out_path: str,
    thresholds: Optional[Sequence[float]] = None,
    title: str = "Success plot (OPE)",
) -> str:
    """Write a success-rate-vs-overlap-threshold plot.

    Args:
      curves: tracker name → success rates over ``thresholds`` (the
        ``success_curve`` from got10k_eval.summarize / ope_metrics).
      thresholds: x values; default the standard 0..1 step .05 grid.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(curves) > len(SERIES_COLORS):
        raise ValueError(f"≤{len(SERIES_COLORS)} trackers per plot; fold or facet the rest")
    if thresholds is None:
        from feartracker_tpu.evaluate.got10k_eval import SUCCESS_THRESHOLDS

        thresholds = SUCCESS_THRESHOLDS
    thresholds = np.asarray(thresholds, float)

    fig, ax = plt.subplots(figsize=(5.4, 4.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for (name, ys), color in zip(curves.items(), SERIES_COLORS):
        ys = np.asarray(ys, float)
        auc = ys.mean()
        ax.plot(thresholds, ys, color=color, linewidth=2.0, label=f"{name} [{auc:.3f}]")

    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_xlabel("Overlap threshold", color=INK_MUTED)
    ax.set_ylabel("Success rate", color=INK_MUTED)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.tick_params(colors=INK_MUTED, labelsize=9)
    for spine in ax.spines.values():
        spine.set_color(GRID)
    if len(curves) >= 2:
        leg = ax.legend(frameon=False, fontsize=9, loc="lower left")
        for text in leg.get_texts():
            text.set_color(INK_PRIMARY)
        ax.set_title(title, color=INK_PRIMARY, fontsize=11)
    else:
        # single series: the title names it, no legend box
        only = next(iter(curves))
        auc = float(np.asarray(curves[only], float).mean())
        ax.set_title(f"{title} — {only} [AUC {auc:.3f}]", color=INK_PRIMARY, fontsize=11)
    fig.tight_layout()
    fig.savefig(out_path, facecolor=SURFACE)
    plt.close(fig)
    return out_path
