"""Plot artifacts mirroring the reference's human-facing charts.

Chart-for-chart equivalents of scTagger.py:323-359 (stage-1 edit-distance
bar + cumulative), :398-430 (stage-2 coverage/elbow) and :719-755 (the
match_trie distance histogram — dead code in the reference, kept here for
surface completeness). Pixel-exact parity is not a goal; the encoded numbers
are identical. matplotlib/pandas are imported lazily so headless kernels
never pay for them.
"""

from __future__ import annotations

from math import ceil


def plot_extract_lr_bc(rnames, dists, outfile) -> None:
    """Edit-distance histogram with cumulative counts/percentages."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.ticker as mtick
    import numpy as np

    dists = np.asarray(dists)
    values, counts = np.unique(dists, return_counts=True)
    # Reference quirks reproduced exactly (scTagger.py:398-414): the groupby
    # rows sort by distance ascending (NA = -1 first when present), then ROW
    # 0 — positionally, whatever distance it holds — moves last; labels are
    # POSITIONAL too (rename {0:'NA', 1:'0', ..., 11:'10'}; rows past 11
    # keep their integer position as the label). With no NA bucket this
    # labels distance 0 as 'NA' etc. — kept for chart parity.
    k = len(values)
    order = list(range(1, k)) + ([0] if k else [])
    counts = counts[order]
    labels = [
        "NA" if p == 0 else (str(p - 1) if p <= 11 else str(p))
        for p in order
    ]
    cum = np.cumsum(counts)
    cum_pct = cum / max(len(dists), 1) * 100

    fig = plt.figure(figsize=(10, 5))
    ax = fig.add_subplot(111)
    ax2 = ax.twinx()
    x = np.arange(len(values))
    width = 0.2
    ax.bar(x - width / 2, counts, width=width, color="red")
    ax.bar(x + width / 2, cum, width=width, color="blue")
    ax2.bar(x + width / 2, cum_pct, width=width, color="blue")
    ax.set_xticks(x, labels)
    ax.set_ylabel("Number of Long-reads")
    ax.set_xlabel("Edit distance")
    ax2.yaxis.set_major_formatter(mtick.PercentFormatter())
    ax2.set_ylabel("Percentage of Long-reads")
    plt.savefig(outfile)
    plt.close(fig)


def plot_sr_bc_coverage(distribution, step_size, last_idx, outfile) -> None:
    """Cumulative coverage + per-step increment with the selection cut line."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.ticker as mtick

    x = sorted(distribution.keys())
    y1 = [distribution[idx] * 100 for idx in x]
    y2 = list(y1)
    for idx in range(1, len(y2)):
        y2[idx] = y1[idx] - y1[idx - 1]
    fig = plt.figure(figsize=(10, 5))
    fig.suptitle(f"SR coverage with each additional {step_size} unique barcodes")
    ax1 = fig.add_subplot(111)
    plt.xticks(
        range(step_size, max(x), step_size * ceil(max(x) / step_size / 18)),
        rotation=45,
    )
    ax2 = ax1.twinx()
    lines = []
    lines.extend(
        ax1.plot(x, y1, color="#1b9e77", label="Cumulative % coverage (left y-axis)")
    )
    lines.extend(ax2.plot(x, y2, color="#d95f02", label="Coverage (right y-axis)"))
    ax2.yaxis.set_major_formatter(mtick.PercentFormatter())
    ax1.yaxis.set_major_formatter(mtick.PercentFormatter())
    lines.extend(
        ax2.plot(
            [last_idx, last_idx],
            [min(y2), max(y2)],
            color="#7570b3",
            label="Selected barcodes",
            ls="dashed",
        )
    )
    plt.legend(lines, [l.get_label() for l in lines], loc="center right")
    plt.savefig(outfile)
    plt.close(fig)


def plot_match_trie(dists, outfile) -> None:
    """Distance histogram over matched reads (reference dead-code equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    values, counts = np.unique(np.asarray(dists), return_counts=True)
    fig = plt.figure()
    ax = fig.add_subplot(111)
    ax.bar([str(v) for v in values], counts, width=0.2, color="red")
    ax.set_ylabel("Number of long-reads")
    ax.set_xlabel("Edit distance")
    plt.savefig(outfile)
    plt.close(fig)
