"""Smoke tests for the live-plot widgets (viz/fast_plot.py — the
matplotlib re-home of the reference's vispy `common/plot_utils.py`)."""

import numpy as np

from steppingstone_tpu.viz.fast_plot import Plot, ScatterPlot, TimeSeriesPlot


def test_time_series_add_point_and_save(tmp_path):
    ts = TimeSeriesPlot(num_lines=2, names=["rew", "len"], title="t")
    for i in range(50):
        ts.add_point(np.sin(i / 5.0), line_num=0)
        ts.add_point(i * 0.1, line_num=1, redraw=(i % 10 == 0))
    x, y = ts._lines[0].get_data()
    assert len(x) == 50 and np.isfinite(y).all()
    # bounds only ever expand (CustomPanZoomCamera.expand_bounds analog)
    lo, hi = ts.ax.get_ylim()
    assert lo <= -0.99 and hi >= 4.9
    out = tmp_path / "ts.png"
    ts.savefig(out)
    assert out.stat().st_size > 0
    ts.close()


def test_scatter_update(tmp_path):
    sc = ScatterPlot(title="pts")
    pts = np.random.RandomState(0).randn(32, 2)
    sc.update(pts)
    assert sc._scat.get_offsets().shape == (32, 2)
    sc.update(pts[:4])
    assert sc._scat.get_offsets().shape == (4, 2)
    sc.savefig(tmp_path / "sc.png")
    sc.close()


def test_shared_figure_grid():
    root = Plot(nrows=1, ncols=2, title="grid")
    a = TimeSeriesPlot(parent=root, title="a")
    b = ScatterPlot(parent=root, title="b")
    a.add_point(1.0)
    b.update([[0.0, 1.0]])
    assert a.fig is root.fig and b.fig is root.fig
    root.close()
