"""Visual regression for GPS map plotting (reference visualize/plot.py).

The drawn offline basemap (graticule + scale bar + north arrow) must be
deterministic: the rendered figure is compared against a committed golden
artifact (tests/golden/gps_map.npz). The cached-tile path is exercised
with synthetic tiles in the standard {z}/{x}/{y}.png layout.
"""

from pathlib import Path

import numpy as np
import pytest

from routeformer_tpu.visualize.basemap import (
    _tile_extent,
    _tile_index,
    add_basemap,
    lonlat_to_mercator,
    mercator_to_lonlat,
)
from routeformer_tpu.visualize.plot import (
    plot_gps_data_on_map,
    render_figure_to_image,
)

GOLDEN = Path(__file__).parent / "golden" / "gps_map.npz"


def demo_track():
    """Deterministic short drive near Tuebingen (the GEM region)."""
    t = np.linspace(0, 1, 40)
    lat = 48.52 + 0.001 * t + 0.0002 * np.sin(6 * t)
    lon = 9.05 + 0.0015 * t
    return {"latitude": lat, "longitude": lon}


def render_map():
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    ax = plot_gps_data_on_map(
        demo_track(), coordinate_system="EPSG:4326",
        figure_kwargs={"figsize": (5, 5), "frameon": False},
        plot_kwargs={"markersize": 12, "marker": "o", "color": "blue"},
    )
    fig = ax.get_figure()
    img = render_figure_to_image(fig)
    plt.close(fig)
    return img


class TestDrawnBasemap:
    def test_projection_roundtrip(self):
        lon, lat = np.array([9.05, -120.0]), np.array([48.52, -33.0])
        x, y = lonlat_to_mercator(lon, lat)
        lon2, lat2 = mercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_map_renders_with_cartography(self):
        img = render_map()
        assert img.ndim == 3 and img.shape[2] == 3
        flat = img.reshape(-1, 3)
        # land-tone background dominates
        land = (np.abs(flat.astype(int) - [242, 239, 233]).sum(1) < 12).mean()
        assert land > 0.5, f"land tone covers only {land:.0%}"
        # the blue track markers are present
        blue = ((flat[:, 2] > 150) & (flat[:, 0] < 120)).sum()
        assert blue > 50, "trajectory markers missing"
        # dark cartography (scale bar / north arrow / labels) present
        dark = (flat.sum(1) < 250).sum()
        assert dark > 100, "scale bar / annotations missing"

    def test_visual_regression_golden(self):
        """Pixel-level stability against the committed artifact. Regenerate
        deliberately with: python tests/test_visualize.py"""
        img = render_map()
        if not GOLDEN.exists():
            pytest.fail(
                "golden artifact missing — run `python tests/test_visualize.py` "
                "to generate it"
            )
        want = np.load(GOLDEN)["img"]
        assert img.shape == want.shape, (img.shape, want.shape)
        diff = np.abs(img.astype(int) - want.astype(int))
        # identical renderer -> identical bytes; tolerate tiny antialiasing
        # drift across matplotlib point releases
        assert float(diff.mean()) < 3.0, f"mean abs diff {diff.mean():.2f}"


class TestTileBasemap:
    def _make_tiles(self, root, bounds, zoom=15, color=(180, 210, 240)):
        import cv2

        tx0, ty1 = _tile_index(bounds[0], bounds[1], zoom)
        tx1, ty0 = _tile_index(bounds[2], bounds[3], zoom)
        made = 0
        for tx in range(int(tx0), int(tx1) + 1):
            for ty in range(int(ty0), int(ty1) + 1):
                d = Path(root) / str(zoom) / str(tx)
                d.mkdir(parents=True, exist_ok=True)
                tile = np.full((256, 256, 3), color[::-1], np.uint8)  # BGR
                cv2.imwrite(str(d / f"{ty}.png"), tile)
                made += 1
        return made

    def test_cached_tiles_drawn(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        track = demo_track()
        x, y = lonlat_to_mercator(track["longitude"], track["latitude"])
        bounds = (x.min() - 50, y.min() - 50, x.max() + 50, y.max() + 50)
        n = self._make_tiles(tmp_path, bounds)
        assert n >= 1

        fig, ax = plt.subplots(figsize=(4, 4))
        ax.set_xlim(bounds[0], bounds[2])
        ax.set_ylim(bounds[1], bounds[3])
        add_basemap(ax, bounds, tile_dir=tmp_path, zoom=15)
        img = render_figure_to_image(fig)
        plt.close(fig)
        flat = img.reshape(-1, 3)
        tile_color = (
            np.abs(flat.astype(int) - [180, 210, 240]).sum(1) < 12
        ).mean()
        assert tile_color > 0.3, f"tiles cover only {tile_color:.0%}"

    def test_tile_extent_roundtrip(self):
        x, y = lonlat_to_mercator(np.array([9.05]), np.array([48.52]))
        tx, ty = _tile_index(float(x[0]), float(y[0]), 15)
        x0, x1, y0, y1 = _tile_extent(int(tx), int(ty), 15)
        assert x0 <= x[0] <= x1 and y0 <= y[0] <= y1

    def test_missing_tiles_fall_back_to_graticule(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(3, 3))
        bounds = tuple(
            float(v)
            for v in (*lonlat_to_mercator(9.0, 48.0), *lonlat_to_mercator(9.01, 48.01))
        )
        bounds = (bounds[0], bounds[1], bounds[2], bounds[3])
        ax.set_xlim(bounds[0], bounds[2])
        ax.set_ylim(bounds[1], bounds[3])
        add_basemap(ax, bounds, tile_dir=tmp_path)  # empty mirror
        img = render_figure_to_image(fig)
        plt.close(fig)
        flat = img.reshape(-1, 3)
        land = (np.abs(flat.astype(int) - [242, 239, 233]).sum(1) < 12).mean()
        assert land > 0.3


if __name__ == "__main__":
    # regenerate the golden artifact deliberately
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN, img=render_map())
    print(f"wrote {GOLDEN}")
