"""Shared figure helper for the executable tutorials.

The reference publishes its tutorials as notebooks with rendered inline
figures (reference docs/tutorials/{fastgp,hht,wavelet}.ipynb,
docs/index.rst:30-45). These tutorials are plain scripts; when
``PERIODICITY_TPU_FIGDIR`` is set (the CI docs job points it at the
rendered site's ``figures/`` directory) each ``save_fig`` call writes a
PNG that ``docs/build_docs.py`` embeds into the tutorial's HTML page.
Without the env var the figures are silently skipped, so running a
tutorial stays dependency-light and fast.

Colors are a fixed-order categorical palette validated for adjacent-pair
colorblind separation; magnitude maps (spectrograms) use a single-hue
sequential ramp, never a rainbow.
"""

import os

# fixed-order categorical series colors (validated palette; assign in
# order, never cycle by rank)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
# single-hue sequential colormap for magnitude (time-frequency power)
SEQUENTIAL_CMAP = "Blues"
GRID_KW = dict(color="0.85", linewidth=0.6)


def fig_dir():
    return os.environ.get("PERIODICITY_TPU_FIGDIR")


def new_figure(*args, **kwargs):
    """A matplotlib figure on the headless Agg backend, or None when
    figure output is disabled (no PERIODICITY_TPU_FIGDIR)."""
    if not fig_dir():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt.figure(*args, **kwargs)


def save_fig(fig, name):
    """Write ``<FIGDIR>/<name>.png`` and close the figure (no-op when
    figures are disabled). ``name`` must start with the tutorial's module
    stem so the docs builder can attach it to the right page."""
    if fig is None:
        return
    import matplotlib.pyplot as plt

    out = fig_dir()
    os.makedirs(out, exist_ok=True)
    fig.savefig(os.path.join(out, f"{name}.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)
